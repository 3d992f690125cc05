"""Fused multi-head attention for small/medium sequence lengths.

The maze-family models run attention at L ∈ {8..128} with H=8..12 heads and
large batch. Per-(B,H) batched attention lowers to thousands of padded MXU
micro-matmuls with HBM round-trips for logits/probs (see docs/RESULTS.md
"Small-L attention"). Two TPU-native alternatives, picked by H·L:

- H·L ≤ 256: block-diagonal concat-heads — pure XLA, one batched matmul
  (models/transformer.py dense_attention_blockdiag).
- 256 < H·L ≤ 1024: this Pallas kernel — grid over B, all heads resident in
  VMEM per step, logits never touch HBM (measured 10.1 vs 11.6 ms per
  12-layer stack at B=256, T=64, H=12 on v5e).

Backward: custom_vjp that recomputes attention with the plain XLA einsum
formulation and differentiates that — numerically the same function, exact
gradients, no hand-written backward kernel (the shapes are far too small for
a bwd kernel to pay for itself).
"""
from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp

try:  # pallas TPU namespace (absent on pure-CPU installs)
    import jax.experimental.pallas.tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

SMALL_MHA_MAX_ROWS = 1024


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   n_heads: int) -> jnp.ndarray:
    """Reference formulation on the packed [B, L, H*Dh] layout."""
    B, L, HD = q.shape
    dh = HD // n_heads
    qh = q.reshape(B, L, n_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, n_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, n_heads, dh).transpose(0, 2, 1, 3)
    # f32 accumulation in the logits matmul — matches the Pallas kernel's
    # preferred_element_type=f32, so the recompute-based backward
    # differentiates the same function the forward computed
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * dh ** -0.5
    p = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(B, L, HD)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, n_heads: int, dh: int):
    scale = dh ** -0.5
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _fwd_pallas(q, k, v, n_heads):
    B, L, HD = q.shape
    dh = HD // n_heads
    return pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, dh=dh),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, L, HD), lambda b: (b, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, L, HD), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def small_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              n_heads: int) -> jnp.ndarray:
    """Packed multi-head attention: q/k/v [B, L, H*Dh] → [B, L, H*Dh]."""
    if not _HAVE_PLTPU or jax.default_backend() != "tpu":
        return _xla_attention(q, k, v, n_heads)
    return _fwd_pallas(q, k, v, n_heads)


def _small_mha_fwd(q, k, v, n_heads):
    return small_mha(q, k, v, n_heads), (q, k, v)


def _small_mha_bwd(n_heads, res, do):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, n_heads),
                     q, k, v)
    return vjp(do)


small_mha.defvjp(_small_mha_fwd, _small_mha_bwd)


# ---------------------------------------------------------------------------
# G-batch-packed block-diagonal kernel (round-4: the postmortem fix)
# ---------------------------------------------------------------------------
#
# The round-3 grouped-packing postmortem (docs/RESULTS.md "Small-L
# attention") found the XLA G=2 block-diagonal packing wins the RAW op 2.9×
# at T=64 but LOSES the fused pipeline: XLA materializes the [G·L, G·L] f32
# logits plus the mask select in HBM, defeating the LN/FiLM fusion. This
# kernel keeps that exact packing — G *batch elements* stacked along the row
# axis, one [G·L, G·L] matmul per head with a static block-diagonal mask —
# but entirely in VMEM: per grid step only q/k/v tiles stream in and the
# output streams out, the same HBM traffic the unpacked path already pays.
# Packing batch (not heads) keeps rows tile-aligned for any H and leaves
# the contraction at Dh for scores and G·L (≥128) for the P·V matmul.


def _kernel_packed(q_ref, k_ref, v_ref, o_ref, *, n_heads: int, dh: int,
                   G: int, L: int):
    scale = dh ** -0.5
    R = G * L
    rows_g = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // L
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // L
    diag = rows_g == cols_g
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[:, :, sl].reshape(R, dh)
        k = k_ref[:, :, sl].reshape(R, dh)
        v = v_ref[:, :, sl].reshape(R, dh)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.where(diag, logits, -1e30)
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = o.reshape(G, L, dh).astype(o_ref.dtype)


def _fwd_pallas_packed(q, k, v, n_heads, G, interpret=False):
    B, L, HD = q.shape
    dh = HD // n_heads
    Bp = -(-B // G) * G
    if Bp != B:
        # pad batch: padded rows attend only within their own (zero) block —
        # a uniform softmax over zero values, discarded by the slice below
        pad = ((0, Bp - B), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    out = pl.pallas_call(
        functools.partial(_kernel_packed, n_heads=n_heads, dh=dh, G=G, L=L),
        grid=(Bp // G,),
        in_specs=[pl.BlockSpec((G, L, HD), lambda b: (b, 0, 0))] * 3,
        out_specs=pl.BlockSpec((G, L, HD), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, L, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)) if _HAVE_PLTPU else None,
        interpret=interpret,
    )(q, k, v)
    return out[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def small_mha_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     n_heads: int, group_b: int = 8,
                     interpret: bool = False) -> jnp.ndarray:
    """Batch-packed block-diagonal MHA: q/k/v [B, L, H*Dh] → [B, L, H*Dh].

    `group_b` batch elements share one [G·L, G·L] block-diagonal matmul per
    head, computed per grid step with logits resident in VMEM. Backward is
    the recompute-via-XLA custom_vjp small_mha uses (the shapes are too
    small for a hand bwd kernel to pay for itself).
    """
    if not interpret and (not _HAVE_PLTPU or jax.default_backend() != "tpu"):
        return _xla_attention(q, k, v, n_heads)
    return _fwd_pallas_packed(q, k, v, n_heads, group_b, interpret)


def _small_mha_packed_fwd(q, k, v, n_heads, group_b, interpret):
    return small_mha_packed(q, k, v, n_heads, group_b, interpret), (q, k, v)


def _small_mha_packed_bwd(n_heads, group_b, interpret, res, do):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, n_heads),
                     q, k, v)
    return vjp(do)


small_mha_packed.defvjp(_small_mha_packed_fwd, _small_mha_packed_bwd)
