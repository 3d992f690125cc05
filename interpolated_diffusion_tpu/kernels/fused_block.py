"""Fully-fused FiLM transformer block for small-L sequences (round 5).

The round-4 profile (docs/profile_smallL.json, measured on-chip) shows
attention still at 54% of the T=64 Stage-2 stack even with the batch-packed
small_mha_packed kernel, and the round-3 postmortem (docs/RESULTS.md
"Small-L attention") identified the remaining cost as the fusion boundary:
every pallas_call forces the [B,L,3D] qkv and [B,L,D] attention output
through HBM, and XLA cannot fuse the LN/FiLM/residual chain across it.

This kernel erases the boundary: ONE pallas_call per transformer block
computes

    h   = FiLM(LN1(x))              (f32 statistics, per-sample γ/β)
    qkv = h @ Wqkv + b
    o   = blockdiag-MHA(qkv)        (G batch elements packed per grid step,
                                     per-head [G·L, G·L] logits in VMEM)
    x'  = x + o @ Wout + b
    y   = x' + FFN(FiLM2(LN2(x')))  (SiLU)

per grid step over B/G groups. All weights (~3.5 MB bf16 at the bench
config) stay VMEM-resident across grid steps (constant index_map → Pallas
skips the re-fetch), so per-layer HBM traffic drops from ~100 MB (qkv +
attn round-trips + elementwise re-reads) to x-in + y-out + one weight pass.

The FiLM γ/β projections from the conditioning vector stay OUTSIDE the
kernel (a [B, d_cond]→[B, 2D] matmul — tiny, and it keeps the kernel free
of the cond encoder). Causal masking is not supported (the causal models
sample chunked / ring-sharded instead).

Backward: custom_vjp recomputing through the plain-XLA twin
(`_xla_block`), the same pattern as kernels/small_mha — exact gradients of
the same function, no hand-written bwd kernel.

Reference analogue: src/models/transformer.py:8-47 (TransformerBlock); the
reference runs it as unfused torch modules.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

try:  # pallas TPU namespace (absent on pure-CPU installs)
    import jax.experimental.pallas.tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False


def _ln_film(x, scale, bias, gb, eps=1e-6):
    """f32 LayerNorm over the last axis + per-sample FiLM. x [G, L, D],
    gb [G, 2D] (γ|β) or None."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if gb is not None:
        D = x.shape[-1]
        gamma = gb[:, :D].astype(jnp.float32)[:, None, :]
        beta = gb[:, D:].astype(jnp.float32)[:, None, :]
        h = h * (1.0 + gamma) + beta
    return h


def _kernel(x_ref, gb1_ref, gb2_ref, ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
            wqkv_ref, bqkv_ref, wout_ref, bout_ref,
            wff1_ref, bff1_ref, wff2_ref, bff2_ref, y_ref,
            *, n_heads: int, dh: int, G: int, L: int, use_film: bool):
    D = n_heads * dh
    R = G * L
    cdt = x_ref.dtype  # computation dtype for matmul inputs (bf16 on TPU)

    x = x_ref[...]                                    # [G, L, D]
    h = _ln_film(x, ln1s_ref[...], ln1b_ref[...],
                 gb1_ref[...] if use_film else None).astype(cdt)
    qkv = jax.lax.dot_general(                        # [R, 3D] f32 accum
        h.reshape(R, D), wqkv_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(cdt)

    rows_g = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // L
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // L
    diag = rows_g == cols_g
    scale = dh ** -0.5
    o_heads = []
    for hh in range(n_heads):
        q = qkv[:, hh * dh:(hh + 1) * dh]
        k = qkv[:, D + hh * dh:D + (hh + 1) * dh]
        v = qkv[:, 2 * D + hh * dh:2 * D + (hh + 1) * dh]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.where(diag, logits, -1e30)
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o_heads.append(jax.lax.dot_general(
            p.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    o = jnp.concatenate(o_heads, axis=-1).astype(cdt)  # [R, D]

    attn = jax.lax.dot_general(
        o, wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bout_ref[...].astype(jnp.float32)
    x2 = x.astype(jnp.float32) + attn.reshape(G, L, D)

    h2 = _ln_film(x2, ln2s_ref[...], ln2b_ref[...],
                  gb2_ref[...] if use_film else None).astype(cdt)
    f = jax.lax.dot_general(
        h2.reshape(R, D), wff1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bff1_ref[...].astype(jnp.float32)
    f = jax.nn.silu(f).astype(cdt)
    f = jax.lax.dot_general(
        f, wff2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bff2_ref[...].astype(jnp.float32)
    y_ref[...] = (x2 + f.reshape(G, L, D)).astype(y_ref.dtype)


def _xla_block(x, gb1, gb2, ln1s, ln1b, ln2s, ln2b,
               wqkv, bqkv, wout, bout, wff1, bff1, wff2, bff2,
               n_heads: int, use_film: bool):
    """Plain-XLA twin of the kernel (same math; backward differentiates
    this). x [B, L, D]; gb* [B, 2D]."""
    B, L, D = x.shape
    dh = D // n_heads
    cdt = x.dtype
    h = _ln_film(x, ln1s, ln1b, gb1 if use_film else None).astype(cdt)
    qkv = (jnp.einsum("bld,de->ble", h, wqkv.astype(cdt),
                      preferred_element_type=jnp.float32)
           + bqkv.astype(jnp.float32)).astype(cdt)
    qh = qkv[..., :D].reshape(B, L, n_heads, dh).transpose(0, 2, 1, 3)
    kh = qkv[..., D:2 * D].reshape(B, L, n_heads, dh).transpose(0, 2, 1, 3)
    vh = qkv[..., 2 * D:].reshape(B, L, n_heads, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * dh ** -0.5
    p = jax.nn.softmax(logits, axis=-1).astype(cdt)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh,
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(B, L, D).astype(cdt)
    attn = (jnp.einsum("bld,de->ble", o, wout.astype(cdt),
                       preferred_element_type=jnp.float32)
            + bout.astype(jnp.float32))
    x2 = x.astype(jnp.float32) + attn
    h2 = _ln_film(x2, ln2s, ln2b, gb2 if use_film else None).astype(cdt)
    f = (jnp.einsum("bld,df->blf", h2, wff1.astype(cdt),
                    preferred_element_type=jnp.float32)
         + bff1.astype(jnp.float32))
    f = jax.nn.silu(f).astype(cdt)
    f = (jnp.einsum("blf,fd->bld", f, wff2.astype(cdt),
                    preferred_element_type=jnp.float32)
         + bff2.astype(jnp.float32))
    return (x2 + f).astype(x.dtype)


def _fwd_pallas(x, gb1, gb2, ln1s, ln1b, ln2s, ln2b,
                wqkv, bqkv, wout, bout, wff1, bff1, wff2, bff2,
                n_heads, G, use_film, interpret):
    B, L, D = x.shape
    dh = D // n_heads
    F = wff1.shape[1]
    # weight matrices enter VMEM in the computation dtype (they are cast
    # before the matmuls anyway) — at the bench config this halves the
    # resident weight footprint from 6.8 MB f32 to 3.4 MB bf16; biases
    # stay f32 (added to the f32 accumulators, negligible size)
    wqkv, wout = wqkv.astype(x.dtype), wout.astype(x.dtype)
    wff1, wff2 = wff1.astype(x.dtype), wff2.astype(x.dtype)
    Bp = -(-B // G) * G
    if Bp != B:
        pad3 = ((0, Bp - B), (0, 0), (0, 0))
        x = jnp.pad(x, pad3)
        gb1 = jnp.pad(gb1, ((0, Bp - B), (0, 0)))
        gb2 = jnp.pad(gb2, ((0, Bp - B), (0, 0)))
    const = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))
    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, dh=dh, G=G, L=L,
                          use_film=use_film),
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((G, L, D), lambda b: (b, 0, 0)),       # x
            pl.BlockSpec((G, 2 * D), lambda b: (b, 0)),         # gb1
            pl.BlockSpec((G, 2 * D), lambda b: (b, 0)),         # gb2
            const(D), const(D), const(D), const(D),             # ln scales
            const(D, 3 * D), const(3 * D),                      # qkv
            const(D, D), const(D),                              # out proj
            const(D, F), const(F), const(F, D), const(D),       # ffn
        ],
        out_specs=pl.BlockSpec((G, L, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, L, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)) if _HAVE_PLTPU else None,
        interpret=interpret,
    )(x, gb1, gb2, ln1s, ln1b, ln2s, ln2b,
      wqkv, bqkv, wout, bout, wff1, bff1, wff2, bff2)
    return out[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18))
def fused_film_block(x, gb1, gb2, ln1s, ln1b, ln2s, ln2b,
                     wqkv, bqkv, wout, bout, wff1, bff1, wff2, bff2,
                     n_heads: int, group_b: int = 8, use_film: bool = True,
                     interpret: bool = False):
    """One fused FiLM transformer block: x [B, L, D] → [B, L, D].

    gb1/gb2 are the per-sample FiLM (γ|β) rows [B, 2D] (pass zeros with
    use_film=False). Weights are the flax Dense/LayerNorm tensors in their
    checkpoint layout. `group_b` batch elements are packed per grid step
    (block-diagonal attention, bit-equal to per-head attention).
    """
    if not interpret and (not _HAVE_PLTPU
                          or jax.default_backend() != "tpu"):
        return _xla_block(x, gb1, gb2, ln1s, ln1b, ln2s, ln2b,
                          wqkv, bqkv, wout, bout, wff1, bff1, wff2, bff2,
                          n_heads, use_film)
    return _fwd_pallas(x, gb1, gb2, ln1s, ln1b, ln2s, ln2b,
                       wqkv, bqkv, wout, bout, wff1, bff1, wff2, bff2,
                       n_heads, group_b, use_film, interpret)


def _fwd(x, gb1, gb2, ln1s, ln1b, ln2s, ln2b,
         wqkv, bqkv, wout, bout, wff1, bff1, wff2, bff2,
         n_heads, group_b, use_film, interpret):
    y = fused_film_block(x, gb1, gb2, ln1s, ln1b, ln2s, ln2b,
                         wqkv, bqkv, wout, bout, wff1, bff1, wff2, bff2,
                         n_heads, group_b, use_film, interpret)
    return y, (x, gb1, gb2, ln1s, ln1b, ln2s, ln2b,
               wqkv, bqkv, wout, bout, wff1, bff1, wff2, bff2)


def _bwd(n_heads, group_b, use_film, interpret, res, dy):
    _, vjp = jax.vjp(
        lambda *args: _xla_block(*args, n_heads=n_heads, use_film=use_film),
        *res)
    return vjp(dy)


fused_film_block.defvjp(_fwd, _bwd)
