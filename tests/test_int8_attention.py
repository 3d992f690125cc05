"""Int8 quantized block-sparse attention (SageSLA analogue) vs oracles.

Runs the Pallas kernel in interpret mode on the CPU test backend; the
same code path compiles on TPU (int8 QKᵀ on the MXU). Reference capability:
SLA/core.py:122-258 SageSparseLinearAttention + spas_sage_attn CUDA ext.
"""
import jax
import jax.numpy as jnp
import numpy as np

from interpolated_diffusion_tpu.kernels.block_sparse_reference import (
    block_sparse_attention_reference,
)
from interpolated_diffusion_tpu.kernels.int8_attention import (
    _fwd_pallas_int8, int8_block_sparse_attention, quantize_rows,
)


def _full_lut(BH, m_blocks, n_blocks):
    return jnp.broadcast_to(
        jnp.arange(n_blocks, dtype=jnp.int32), (BH, m_blocks, n_blocks)
    )


def test_quantize_rows_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 32))
    x_i8, s = quantize_rows(x)
    assert x_i8.dtype == jnp.int8
    recon = x_i8.astype(jnp.float32) * s[..., None]
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x), atol=0.02)
    # each row's max magnitude hits 127 exactly (symmetric absmax)
    assert int(jnp.abs(x_i8).max()) == 127


def test_int8_fwd_matches_bf16_reference():
    BH, L, D, BM = 2, 256, 64, 64
    q, k, v = jax.random.normal(jax.random.PRNGKey(1), (3, BH, L, D))
    lut = _full_lut(BH, L // BM, L // BM)

    q_i8, qs = quantize_rows(q)
    k_i8, ks = quantize_rows(k)
    o_int8, lse = _fwd_pallas_int8(
        q_i8, k_i8, v.astype(jnp.bfloat16), qs, ks, lut, BM, BM,
        D ** -0.5, int8_matmul=True, interpret=True,
    )
    o_ref, _ = block_sparse_attention_reference(q, k, v, lut, BM, BM)
    # int8 Q/K: ~1% relative error is the expected quantization floor
    err = np.abs(np.asarray(o_int8, np.float32) - np.asarray(o_ref)).max()
    assert err < 0.05, f"int8 attention error too large: {err}"
    assert np.isfinite(np.asarray(lse)).all()


def test_int8_partial_topk_ragged():
    BH, L, D, BM = 2, 200, 64, 64  # ragged tail
    q, k, v = jax.random.normal(jax.random.PRNGKey(2), (3, BH, L, D))
    m_blocks = -(-L // BM)
    topk = 2
    key = jax.random.PRNGKey(3)
    lut = jax.random.randint(key, (BH, m_blocks, topk), 0, m_blocks).astype(jnp.int32)

    o_int8 = int8_block_sparse_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        lut, BM, BM, None, True, "xla", True,
    )
    o_ref, _ = block_sparse_attention_reference(q, k, v, lut, BM, BM)
    err = np.abs(np.asarray(o_int8, np.float32) - np.asarray(o_ref)).max()
    assert err < 0.05, f"err={err}"


def test_int8_grads_straight_through():
    BH, L, D, BM = 1, 128, 64, 64
    q, k, v = jax.random.normal(jax.random.PRNGKey(4), (3, BH, L, D))
    lut = _full_lut(BH, L // BM, L // BM)

    def loss_int8(q, k, v):
        o = int8_block_sparse_attention(q, k, v, lut, BM, BM, None, True,
                                        "xla", True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        o, _ = block_sparse_attention_reference(q, k, v, lut, BM, BM)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.grad(loss_int8, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        # straight-through grads track the unquantized ones closely
        denom = np.abs(np.asarray(b)).max() + 1e-6
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / denom
        assert rel < 0.05, f"grad mismatch rel={rel}"


def test_sla_module_int8_mode():
    from interpolated_diffusion_tpu.kernels.sla import SparseLinearAttention

    B, H, L, D = 1, 2, 256, 64
    q, k, v = jax.random.normal(jax.random.PRNGKey(5), (3, B, H, L, D))
    mod = SparseLinearAttention(head_dim=D, topk=0.5, block_q=64, block_k=64,
                                impl="xla", bwd_impl="xla", quant="int8")
    params = mod.init(jax.random.PRNGKey(6), q, k, v)
    o = mod.apply(params, q, k, v)
    assert o.shape == (B, H, L, D)
    assert np.isfinite(np.asarray(o, np.float32)).all()


def test_int8_pallas_bwd_interpret_forwarding():
    """bwd_impl='pallas' + interpret=True must run the interpreted backward
    kernels off-TPU and match the oracle grads (regression: _bwd_pallas
    accepted `interpret` but never forwarded it into its pallas_calls)."""
    BH, L, D, BM = 1, 128, 64, 64
    q, k, v = jax.random.normal(jax.random.PRNGKey(7), (3, BH, L, D))
    lut = _full_lut(BH, L // BM, L // BM)

    def loss_pallas(q, k, v):
        o = int8_block_sparse_attention(q, k, v, lut, BM, BM, None, True,
                                        "pallas", True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        o, _ = block_sparse_attention_reference(q, k, v, lut, BM, BM)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        denom = np.abs(np.asarray(b)).max() + 1e-6
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / denom
        assert rel < 0.05, f"grad mismatch rel={rel}"
