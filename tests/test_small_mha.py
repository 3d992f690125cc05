"""small_mha kernel: oracle parity, exact gradients, transformer routing."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from interpolated_diffusion_tpu.kernels.small_mha import (
    _xla_attention,
    small_mha,
)


def _mk(B=4, L=64, H=12, dh=32, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, L, H * dh)
    return (jax.random.normal(k[0], shape), jax.random.normal(k[1], shape),
            jax.random.normal(k[2], shape))


def test_small_mha_matches_per_head_oracle():
    q, k, v = _mk()
    H, dh = 12, 32
    out = small_mha(q, k, v, H)
    # independent per-head softmax-attention oracle
    B, L, HD = q.shape
    qh = q.reshape(B, L, H, dh)
    kh = k.reshape(B, L, H, dh)
    vh = v.reshape(B, L, H, dh)
    ref = np.zeros((B, L, H, dh), np.float32)
    for b in range(B):
        for h in range(H):
            logits = np.asarray(qh[b, :, h] @ kh[b, :, h].T, np.float64) * dh ** -0.5
            p = np.exp(logits - logits.max(axis=1, keepdims=True))
            p /= p.sum(axis=1, keepdims=True)
            ref[b, :, h] = p @ np.asarray(vh[b, :, h], np.float64)
    np.testing.assert_allclose(np.asarray(out), ref.reshape(B, L, HD),
                               atol=2e-5, rtol=1e-4)


def test_small_mha_gradients_match_xla():
    q, k, v = _mk(B=2, L=16, H=4, dh=8)

    def loss_kernel(q, k, v):
        return (small_mha(q, k, v, 4) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_attention(q, k, v, 4) ** 2).sum()

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-5)


def test_transformer_small_mha_flag_matches_default_path():
    """use_small_mha=True (opt-in packed kernel) must match the default
    per-head path on identical params."""
    from interpolated_diffusion_tpu.models.transformer import TransformerBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 96))
    blk = TransformerBlock(d_model=96, n_heads=12, d_ff=128, use_film=False)
    params = blk.init(jax.random.PRNGKey(1), x)["params"]
    out_ref = blk.apply({"params": params}, x)
    blk_k = TransformerBlock(d_model=96, n_heads=12, d_ff=128, use_film=False,
                             use_small_mha=True)
    out = blk_k.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("L,causal", [(8, False), (16, False), (64, False),
                                      (64, True), (33, False)])
def test_grouped_blockdiag_matches_dense(L, causal, monkeypatch):
    """Grouped head-packing (G heads per tile-aligned row block, static
    block-diagonal mask) is numerically identical to per-head attention for
    every group size the dispatch can pick."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from interpolated_diffusion_tpu.models.transformer import (
        _blockdiag_group, dense_attention, dense_attention_blockdiag)

    # the grouped policy (non-default since the round-3 e2e A/B: 'full'
    # wins the fused pipeline; 'group' stays available for raw-op uses)
    monkeypatch.setenv("ID_TPU_SMALL_ATTN", "group")
    B, H, Dh = 3, 12, 32
    ks = jax.random.split(jax.random.PRNGKey(L), 3)
    q, k, v = (jax.random.normal(kk, (B, H, L, Dh)) for kk in ks)
    ref = dense_attention(q, k, v, causal=causal)
    G = _blockdiag_group(H, L)
    assert G * L <= 128 and H % G == 0
    out = dense_attention_blockdiag(q, k, v, causal=causal, group=G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    # full pack (G=H) must stay exact too when it fits one tile
    if H * L <= 128:
        out_full = dense_attention_blockdiag(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out_full), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_small_attn_policy_dispatch(monkeypatch):
    """The trace-time policy env picks the documented group sizes."""
    from interpolated_diffusion_tpu.models.transformer import _blockdiag_group

    monkeypatch.setenv("ID_TPU_SMALL_ATTN", "full")
    assert _blockdiag_group(12, 8) == 12    # H*L=96  <= 256: full pack
    assert _blockdiag_group(12, 16) == 12   # H*L=192 <= 256: full pack
    assert _blockdiag_group(12, 64) == 1    # H*L=768 > 256: per-head
    monkeypatch.setenv("ID_TPU_SMALL_ATTN", "group")
    assert _blockdiag_group(12, 64) == 2    # G*L = 128 = one tile edge
    assert _blockdiag_group(12, 33) == 3
    monkeypatch.setenv("ID_TPU_SMALL_ATTN", "none")
    assert _blockdiag_group(12, 8) == 1
    monkeypatch.delenv("ID_TPU_SMALL_ATTN")
    assert _blockdiag_group(12, 8) == 12    # default policy = full
    assert _blockdiag_group(12, 64) == 1


def test_small_mha_packed_matches_xla_interpret():
    """The round-4 batch-packed block-diagonal kernel (interpret mode) is
    numerically identical to the XLA per-head formulation, including the
    batch-padding tail (B not divisible by G)."""
    from interpolated_diffusion_tpu.kernels.small_mha import small_mha_packed

    for B, L, H, dh, G in [(6, 64, 12, 32, 2), (5, 8, 12, 32, 4),
                           (8, 128, 8, 48, 4)]:
        ks = jax.random.split(jax.random.PRNGKey(B), 3)
        q, k, v = (jax.random.normal(kk, (B, L, H * dh)) for kk in ks)
        out = small_mha_packed(q, k, v, H, G, True)
        ref = _xla_attention(q, k, v, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_small_mha_packed_gradients_match_xla():
    from interpolated_diffusion_tpu.kernels.small_mha import small_mha_packed

    q, k, v = _mk(B=2, L=16, H=4, dh=8)
    g1 = jax.grad(lambda q, k, v: (small_mha_packed(q, k, v, 4, 2, True) ** 2
                                   ).sum(), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: (_xla_attention(q, k, v, 4) ** 2
                                   ).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-5)


def test_fused_policy_dispatch(monkeypatch):
    """The round-4 'fused' policy applies exactly in the mid-size window
    (256 < H·L, L <= 256, non-causal) and degrades to 'full' elsewhere."""
    from interpolated_diffusion_tpu.kernels.tuning import fused_group_b
    from interpolated_diffusion_tpu.models.transformer import (
        _blockdiag_group, _use_fused_packed)

    monkeypatch.setenv("ID_TPU_SMALL_ATTN", "fused")
    assert _use_fused_packed(12, 64, False)        # H*L=768: the target case
    assert not _use_fused_packed(12, 8, False)     # H*L=96: XLA full pack
    assert not _use_fused_packed(12, 64, True)     # causal: XLA paths
    assert not _use_fused_packed(12, 512, False)   # beyond the small-L window
    # fallback blockdiag choice under 'fused' == 'full' behavior
    assert _blockdiag_group(12, 8) == 12
    assert _blockdiag_group(12, 64) == 1
    # row-target → G
    assert fused_group_b(64) == 8                  # 512 // 64
    monkeypatch.setenv("ID_TPU_FUSED_ROWS", "128")
    assert fused_group_b(64) == 2
    monkeypatch.delenv("ID_TPU_FUSED_ROWS")


def test_transformer_fused_policy_matches_none(monkeypatch):
    """TransformerBlock output under the fused policy matches the plain
    per-head policy on identical params (CPU: the packed kernel's XLA
    fallback — exercises the dispatch plumbing; the Pallas leg is covered
    by interpret-mode tests above and on-chip by scripts/bench_sweep.py)."""
    from interpolated_diffusion_tpu.models.transformer import TransformerBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 384))
    blk = TransformerBlock(d_model=384, n_heads=12, d_ff=256, use_film=False)
    params = blk.init(jax.random.PRNGKey(1), x)["params"]
    monkeypatch.setenv("ID_TPU_SMALL_ATTN", "none")
    out_ref = blk.apply({"params": params}, x)
    monkeypatch.setenv("ID_TPU_SMALL_ATTN", "fused")
    out = blk.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)


def test_profile_skip_attn_skeleton(monkeypatch):
    """ID_TPU_PROFILE_SKIP_ATTN (scripts/profile_pipeline.py's skeleton
    knob) keeps shapes/params identical, changes the output (attention math
    actually removed), and has no effect when unset."""
    from interpolated_diffusion_tpu.models.transformer import TransformerBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
    blk = TransformerBlock(d_model=64, n_heads=4, d_ff=128, use_film=False)
    params = blk.init(jax.random.PRNGKey(1), x)["params"]
    out_real = blk.apply({"params": params}, x)
    monkeypatch.setenv("ID_TPU_PROFILE_SKIP_ATTN", "1")
    out_skel = blk.apply({"params": params}, x)
    assert out_skel.shape == out_real.shape
    assert not np.allclose(np.asarray(out_skel), np.asarray(out_real))
    monkeypatch.delenv("ID_TPU_PROFILE_SKIP_ATTN")
    out_again = blk.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_again), np.asarray(out_real),
                               atol=1e-6)
