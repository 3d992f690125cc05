"""Block-sparse attention kernel tests vs a dense jnp oracle.

On the CPU test backend the Pallas kernel runs in interpret mode; the same
tests execute compiled on TPU (scripts/verify_kernel_tpu.py drives that).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpolated_diffusion_tpu.kernels.block_sparse_reference import (
    block_sparse_attention_reference,
)
from interpolated_diffusion_tpu.kernels.sla import (
    SparseLinearAttention,
    get_block_map,
    mean_pool_blocks,
)


def _dense_attention(q, k, v, scale=None):
    scale = scale or q.shape[-1] ** -0.5
    logits = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))


def _full_lut(BH, m_blocks, n_blocks):
    lut = jnp.broadcast_to(jnp.arange(n_blocks, dtype=jnp.int32), (BH, m_blocks, n_blocks))
    return lut


def test_reference_full_topk_equals_dense():
    BH, L, D, BM = 3, 256, 64, 64
    key = jax.random.PRNGKey(0)
    q, k, v = jax.random.normal(key, (3, BH, L, D))
    lut = _full_lut(BH, L // BM, L // BM)
    o_ref, lse = block_sparse_attention_reference(q, k, v, lut, BM, BM)
    o_dense = _dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_dense), atol=2e-5)


def test_reference_ragged_length():
    BH, L, D, BM = 2, 200, 64, 64  # L not a multiple of 64
    key = jax.random.PRNGKey(1)
    q, k, v = jax.random.normal(key, (3, BH, L, D))
    m_blocks = -(-L // BM)
    lut = _full_lut(BH, m_blocks, m_blocks)
    o_ref, _ = block_sparse_attention_reference(q, k, v, lut, BM, BM)
    o_dense = _dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_dense), atol=2e-5)


def test_pallas_interpret_matches_reference_partial_topk():
    from interpolated_diffusion_tpu.kernels import block_sparse_attention
    import sys
    bsa_mod = sys.modules["interpolated_diffusion_tpu.kernels.block_sparse_attention"]

    BH, L, D, BM = 2, 256, 64, 64
    key = jax.random.PRNGKey(2)
    q, k, v = jax.random.normal(key, (3, BH, L, D), dtype=jnp.float32)
    _, lut, topk = get_block_map(q, k, topk_ratio=0.5, block_q=BM, block_k=BM)
    o_pal, lse_pal = bsa_mod._fwd_pallas_interpret(q, k, v, lut, BM, BM, D ** -0.5)
    o_ref, lse_ref = block_sparse_attention_reference(q, k, v, lut, BM, BM)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse_pal), np.asarray(lse_ref), atol=1e-4)


def test_xla_backward_matches_dense_on_full_topk():
    from interpolated_diffusion_tpu.kernels.block_sparse_attention import (
        block_sparse_attention,
    )

    BH, L, D, BM = 2, 128, 64, 64
    key = jax.random.PRNGKey(3)
    q, k, v = jax.random.normal(key, (3, BH, L, D))
    lut = _full_lut(BH, L // BM, L // BM)

    def f_sparse(q, k, v):
        return block_sparse_attention(q, k, v, lut, BM, BM, None, "xla", "xla").sum()

    def f_dense(q, k, v):
        return _dense_attention(q, k, v).sum()

    gs = jax.grad(f_sparse, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_mean_pool_blocks_ragged():
    x = jnp.arange(10, dtype=jnp.float32)[None, :, None]
    pooled = mean_pool_blocks(x, 4)
    np.testing.assert_allclose(
        np.asarray(pooled[0, :, 0]), [1.5, 5.5, 8.5]
    )


def test_block_map_topk_shape_and_validity():
    BH, L, D = 2, 512, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (BH, L, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (BH, L, D))
    sparse_map, lut, topk = get_block_map(q, k, 0.25, 128, 128)
    n_blocks = L // 128
    assert topk == max(1, int(0.25 * n_blocks))
    assert lut.shape == (BH, n_blocks, topk)
    assert int(lut.min()) >= 0 and int(lut.max()) < n_blocks
    assert np.all(np.asarray(sparse_map.sum(-1)) == topk)


def test_sla_module_zero_init_equals_sparse_branch():
    """With zero-init proj, SLA output == pure block-sparse attention."""
    B, H, L, D = 1, 2, 256, 64
    key = jax.random.PRNGKey(4)
    q, k, v = jax.random.normal(key, (3, B, H, L, D), dtype=jnp.float32)
    mod = SparseLinearAttention(head_dim=D, topk=1.0, block_q=64, block_k=64,
                                impl="xla", bwd_impl="xla")
    params = mod.init(jax.random.PRNGKey(5), q, k, v)
    o = mod.apply(params, q, k, v)
    o_dense = _dense_attention(
        q.reshape(B * H, L, D), k.reshape(B * H, L, D), v.reshape(B * H, L, D)
    ).reshape(B, H, L, D)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_dense), atol=2e-2, rtol=1e-2)
