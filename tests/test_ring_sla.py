"""Ring-SLA (block-sparse kernel under sequence parallelism) vs global SLA.

SURVEY.md §5.7 phase-2 / VERDICT-r3 #9: routing the flagship block-sparse
kernel under the seq mesh. These tests run on the 8-device CPU mesh and check
(a) the sentinel contract of block_sparse_attention_lse, (b) the ring-built
global LUT matches the single-device get_block_map, (c) ring block-sparse
attention reproduces the global block-sparse oracle given the same LUT, and
(d) the psum-decomposed linear branch is exact.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from interpolated_diffusion_tpu.kernels.block_sparse_attention import (
    block_sparse_attention_lse,
)
from interpolated_diffusion_tpu.kernels.block_sparse_reference import (
    block_sparse_attention_reference,
)
from interpolated_diffusion_tpu.kernels.sla import (
    _linear_attention, get_block_map,
)
from interpolated_diffusion_tpu.parallel.ring import make_seq_mesh
from interpolated_diffusion_tpu.parallel.ring_sla import (
    ring_block_sparse_attention, ring_linear_attention, ring_sla_attention,
    ring_sla_block_map,
)

pytestmark = pytest.mark.slow

multi = pytest.mark.skipif(len(jax.devices()) < 4,
                           reason="needs multi-device mesh")

BM = BN = 8  # tiny blocks: the CPU mesh test exercises the LUT/ring logic


def _qkv(key, BH=4, L=64, D=16):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (BH, L, D), jnp.float32) for k in ks)


# ---------------------------------------------------------------------------
# sentinel contract (single device — the hop primitive itself)
# ---------------------------------------------------------------------------

def test_lse_sentinel_contract():
    q, k, v = _qkv(jax.random.PRNGKey(0), BH=2, L=32, D=8)
    n_blocks = 32 // BN
    sentinel = n_blocks
    # row 0: real blocks {0, 1}; row 1: one real + one sentinel;
    # rows 2-3: ALL sentinel
    lut = jnp.array([[[0, 1], [2, sentinel],
                      [sentinel, sentinel], [sentinel, sentinel]]] * 2,
                    jnp.int32)
    o, lse = block_sparse_attention_lse(q, k, v, lut, BM, BN, impl="reference")
    # all-sentinel rows: zero output, lse far below any real value
    np.testing.assert_allclose(np.asarray(o[:, 2 * BM:]), 0.0, atol=1e-7)
    assert float(jnp.max(lse[:, 2 * BM:])) < -50.0
    # real rows match the plain reference without sentinel padding
    o_ref, lse_ref = block_sparse_attention_reference(
        q, k, v, lut.clip(0, n_blocks - 1), BM, BN
    )
    np.testing.assert_allclose(np.asarray(o[:, :BM]), np.asarray(o_ref[:, :BM]),
                               rtol=1e-5, atol=1e-5)
    # mixed row: sentinel entry contributes nothing — equals the 1-block LUT
    o_one, _ = block_sparse_attention_reference(
        q, k, v, jnp.full((2, 4, 1), 2, jnp.int32), BM, BN
    )
    np.testing.assert_allclose(
        np.asarray(o[:, BM:2 * BM]), np.asarray(o_one[:, BM:2 * BM]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(lse[:, :BM]), np.asarray(lse_ref[:, :BM]),
        rtol=1e-5, atol=1e-5,
    )


# ---------------------------------------------------------------------------
# ring vs global (CPU mesh)
# ---------------------------------------------------------------------------

def _shard_spec():
    return P(None, "seq", None)


@multi
def test_ring_block_map_matches_global():
    n = min(8, len(jax.devices()))
    mesh = make_seq_mesh(n)
    q, k, _ = _qkv(jax.random.PRNGKey(1), BH=4, L=8 * BN * n, D=16)
    spec = _shard_spec()

    fn = jax.jit(jax.shard_map(
        functools.partial(ring_sla_block_map, axis_name="seq",
                          topk_ratio=0.25, block_q=BM, block_k=BN),
        mesh=mesh, in_specs=(spec, spec), out_specs=spec,
    ))
    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    lut_ring = np.asarray(fn(put(q), put(k)))
    _, lut_ref, _ = get_block_map(q, k, 0.25, BM, BN)
    np.testing.assert_array_equal(lut_ring, np.asarray(lut_ref))


@multi
def test_ring_block_sparse_matches_global_oracle():
    n = min(8, len(jax.devices()))
    mesh = make_seq_mesh(n)
    L = 4 * BN * n
    q, k, v = _qkv(jax.random.PRNGKey(2), BH=4, L=L, D=16)
    _, lut, _ = get_block_map(q, k, 0.3, BM, BN)       # global LUT, global ids
    o_ref, _ = block_sparse_attention_reference(q, k, v, lut, BM, BN)

    spec = _shard_spec()
    lut_spec = P(None, "seq", None)                     # m-rows shard with q

    fn = jax.jit(jax.shard_map(
        functools.partial(ring_block_sparse_attention, axis_name="seq",
                          block_m=BM, block_n=BN, impl="reference"),
        mesh=mesh, in_specs=(spec, spec, spec, lut_spec), out_specs=spec,
    ))
    put = lambda x, s=spec: jax.device_put(x, NamedSharding(mesh, s))
    o_ring = fn(put(q), put(k), put(v), put(lut, lut_spec))
    np.testing.assert_allclose(np.asarray(o_ring), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)


@multi
def test_ring_linear_branch_exact():
    n = min(8, len(jax.devices()))
    mesh = make_seq_mesh(n)
    q, k, v = _qkv(jax.random.PRNGKey(3), BH=4, L=16 * n, D=16)
    o_ref = _linear_attention(q, k, v, "softmax")

    spec = _shard_spec()
    fn = jax.jit(jax.shard_map(
        functools.partial(ring_linear_attention, axis_name="seq"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    ))
    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    o_ring = fn(put(q), put(k), put(v))
    np.testing.assert_allclose(np.asarray(o_ring), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)


@multi
def test_ring_sla_host_entry_end_to_end():
    # the full pipeline (map → ring hops → merge) vs global SLA sparse branch
    n = min(8, len(jax.devices()))
    mesh = make_seq_mesh(n)
    L = 4 * BN * n
    q, k, v = _qkv(jax.random.PRNGKey(4), BH=2, L=L, D=16)
    o_ring = ring_sla_attention(q, k, v, mesh, topk_ratio=0.3,
                                block_m=BM, block_n=BN, impl="reference")
    _, lut, _ = get_block_map(q, k, 0.3, BM, BN)
    o_ref, _ = block_sparse_attention_reference(q, k, v, lut, BM, BN)
    np.testing.assert_allclose(np.asarray(o_ring), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)
