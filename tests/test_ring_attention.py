"""Ring attention vs dense oracle on the 8-device CPU mesh.

Sequence parallelism is a NEW capability vs the reference (SURVEY.md §5.7 —
the reference scales sequence only algorithmically). These tests check the
shard_map + ppermute ring produces exact attention (fwd and grad) and that
the causal variant masks by GLOBAL position across chunk boundaries.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpolated_diffusion_tpu.parallel.ring import (
    make_seq_mesh, ring_attention, ring_self_attention,
)

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs multi-device mesh"
)]


def _dense(q, k, v, causal=False):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    s = s * (q.shape[-1] ** -0.5)
    if causal:
        L = q.shape[2]
        mask = jnp.tril(jnp.ones((L, L), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _qkv(key, B=2, H=4, L=64, D=16, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (B, H, L, D), dtype) for k in ks)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_dense(causal):
    n = min(8, len(jax.devices()))
    mesh = make_seq_mesh(n)
    q, k, v = _qkv(jax.random.PRNGKey(0))
    out = ring_attention(q, k, v, mesh, causal=causal)
    ref = _dense(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_grads_match_dense():
    n = min(8, len(jax.devices()))
    mesh = make_seq_mesh(n)
    q, k, v = _qkv(jax.random.PRNGKey(1), L=32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(_dense(q, k, v) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_ring_inside_jitted_shard_map():
    # the form a trainer uses: ring_self_attention inside its own shard_map,
    # under jit, bf16 inputs
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = min(8, len(jax.devices()))
    mesh = make_seq_mesh(n)
    q, k, v = _qkv(jax.random.PRNGKey(2), dtype=jnp.bfloat16)
    spec = P(None, None, "seq", None)

    fn = jax.jit(jax.shard_map(
        partial(ring_self_attention, axis_name="seq"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    ))
    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    out = fn(put(q), put(k), put(v))
    ref = _dense(q.astype(jnp.float32), k.astype(jnp.float32),
                 v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )
