"""Int8-quantized block-sparse attention — the SageSLA analogue, TPU-native.

Capability parity with the reference's quantized attention path
(SLA/core.py:122-258 SageSparseLinearAttention → external `spas_sage_attn`
CUDA extension: int8 Q/K with per-row scales, fp16/fp8 V, per-arch sm80/90
dispatch). On TPU the analogue is a Pallas kernel whose QKᵀ hits the MXU's
native int8 path (2× MACs/cycle vs bf16 on v5e+) and whose Q/K tiles move
over HBM at half the bytes of bf16; P·V stays bf16 (the reference keeps V
high-precision too — int8 V is the dominant quality loss in SageAttention).

Quantization is SageAttention-style: per-ROW absmax int8 symmetric
(`q_i8 = round(127·q/absmax_row)`), with the smooth-k mean subtraction
applied to K before quantization (softmax-invariant; keeps int8 resolution
for the key variation instead of a large common offset). The dequant is a
rank-1 outer product of the row scales applied to the int32 block product —
elementwise VPU work on a [BM, BN] tile.

Backward: quantization is treated as identity (straight-through) and
gradients are computed by the existing bf16 Pallas backward over the same
LUT — matching the reference, whose CUDA extension is forward-quantized
only.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_sparse_attention import (
    _LANES, _LOG2E, _NEG_INF, _bwd_pallas, _bwd_xla, _fwd_pallas, _pad_len,
)


def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8: returns (x_i8 [..., L, D], scales [..., L])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scales = jnp.maximum(absmax, 1e-8) / 127.0
    x_i8 = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scales[..., None]), -127, 127
    ).astype(jnp.int8)
    return x_i8, scales


def _fwd_kernel_int8(
    lut_ref,      # SMEM [BH, M_BLOCKS*topk]
    q_ref,        # VMEM (1, BM, D) int8
    k_ref,        # VMEM (1, BN, D) int8 — LUT-gathered
    v_ref,        # VMEM (1, BN, D) bf16
    qs_ref,       # VMEM (1, M_BLOCKS, BM) f32 — per-row q scales
    ks_ref,       # VMEM (1, N_BLOCKS, BN) f32 — per-row k scales (full rows)
    o_ref,        # VMEM (1, BM, D)
    lse_ref,      # VMEM (1, M_BLOCKS, BM)
    m_scr, l_scr, acc_scr,
    *,
    scale: float, topk: int, L: int, block_n: int, int8_matmul: bool,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    bh, m = pl.program_id(0), pl.program_id(1)
    n_block = lut_ref[bh, m * topk + j]

    if int8_matmul:
        qk_i = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        qk = qk_i.astype(jnp.float32)
    else:
        # bandwidth-only mode: int8 tiles over HBM, bf16 MACs on the MXU
        qk = jax.lax.dot_general(
            q_ref[0].astype(jnp.bfloat16), k_ref[0].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    sq = qs_ref[0, m]                       # [BM]
    sk = ks_ref[0, n_block]                 # [BN]
    qk = qk * (sq[:, None] * sk[None, :]) * (scale * _LOG2E)

    key_pos = n_block * block_n + jax.lax.broadcasted_iota(
        jnp.int32, qk.shape, dimension=1
    )
    qk = jnp.where(key_pos < L, qk, _NEG_INF)

    m_prev = m_scr[:, :1]
    local_m = jnp.max(qk, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, local_m)
    p = jnp.exp2(qk - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == topk - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0, m] = m_scr[:, 0] + jnp.log2(l[:, 0])


def _fwd_pallas_int8(
    q_i8, k_i8, v, q_scales, k_scales, lut,
    block_m: int, block_n: int, scale: float,
    int8_matmul: bool = True, interpret: bool = False,
):
    BH, L, D = q_i8.shape
    m_blocks = lut.shape[1]
    topk = lut.shape[-1]
    n_blocks = _pad_len(L, block_n) // block_n
    Lq, Lk = m_blocks * block_m, n_blocks * block_n
    qp = jnp.pad(q_i8, ((0, 0), (0, Lq - L), (0, 0)))
    kp = jnp.pad(k_i8, ((0, 0), (0, Lk - L), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Lk - L), (0, 0)))
    qsp = jnp.pad(q_scales, ((0, 0), (0, Lq - L))).reshape(BH, m_blocks, block_m)
    ksp = jnp.pad(k_scales, ((0, 0), (0, Lk - L))).reshape(BH, n_blocks, block_n)

    grid = (BH, m_blocks, topk)
    kernel = functools.partial(
        _fwd_kernel_int8, scale=scale, topk=topk, L=L, block_n=block_n,
        int8_matmul=int8_matmul,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_m, D), lambda bh, m, j, lut: (bh, m, 0)),
                pl.BlockSpec((1, block_n, D), lambda bh, m, j, lut: (bh, lut[bh, m * topk + j], 0)),
                pl.BlockSpec((1, block_n, D), lambda bh, m, j, lut: (bh, lut[bh, m * topk + j], 0)),
                pl.BlockSpec((1, m_blocks, block_m), lambda bh, m, j, lut: (bh, 0, 0)),
                pl.BlockSpec((1, n_blocks, block_n), lambda bh, m, j, lut: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_m, D), lambda bh, m, j, lut: (bh, m, 0)),
                pl.BlockSpec((1, m_blocks, block_m), lambda bh, m, j, lut: (bh, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_m, _LANES), jnp.float32),
                pltpu.VMEM((block_m, _LANES), jnp.float32),
                pltpu.VMEM((block_m, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lq, D), v.dtype),
            jax.ShapeDtypeStruct((BH, m_blocks, block_m), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # m sequential: shared full-m lse block (see block_sparse note)
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lut.reshape(BH, m_blocks * topk), qp, kp, vp, qsp, ksp)
    return o[:, :L], lse.reshape(BH, Lq)[:, :L]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def int8_block_sparse_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lut: jnp.ndarray,
    block_m: int = 256,
    block_n: int = 256,
    scale: Optional[float] = None,
    int8_matmul: bool = True,
    bwd_impl: str = "pallas",
    interpret: bool = False,
    bwd_recompute: bool = True,
) -> jnp.ndarray:
    """Quantized block-sparse attention: int8 Q/K (per-row scales), bf16 V.

    Same contract as block_sparse_attention; quantization happens inside.
    Gradients are straight-through: the bf16 backward runs over the same LUT
    with the UNQUANTIZED q/k/v. (This is strictly stronger than the reference
    — SLA/core.py:212-240 writes the sparse output via an in-place CUDA call
    with no autograd graph, so the reference's sparse branch contributes NO
    gradient and only its linear branch trains.)

    bwd_recompute=True (default) recomputes a consistent bf16 (o, lse) pair
    inside the backward — flash-style recompute — so grads match the exact
    bf16 straight-through oracle; with False the backward reuses the
    quantized forward's (o, lse), which rescales each softmax row by the
    int8-vs-bf16 lse gap (cheaper by one sparse fwd, grads carry O(10%)
    quantization noise).
    """
    o, _ = _int8_fwd_only(q, k, v, lut, block_m, block_n, scale,
                          int8_matmul, interpret)
    return o


def _int8_fwd_only(q, k, v, lut, block_m, block_n, scale, int8_matmul,
                   interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    q_i8, q_s = quantize_rows(q)
    # smooth-k (SageAttention): subtract the per-channel key mean before
    # quantizing — softmax-invariant (shifts every logit in a query row by
    # the same q·μ) but keeps the int8 range for the actual key variation
    # instead of wasting it on a large common offset
    k_i8, k_s = quantize_rows(k - k.mean(axis=-2, keepdims=True))
    return _fwd_pallas_int8(
        q_i8, k_i8, v.astype(jnp.bfloat16), q_s, k_s, lut,
        block_m, block_n, scale, int8_matmul, interpret,
    )


def _int8_fwd(q, k, v, lut, block_m, block_n, scale, int8_matmul, bwd_impl,
              interpret, bwd_recompute):
    o, lse = _int8_fwd_only(q, k, v, lut, block_m, block_n, scale,
                            int8_matmul, interpret)
    return o, (q, k, v, lut, o, lse)


def _int8_bwd(block_m, block_n, scale, int8_matmul, bwd_impl, interpret,
              bwd_recompute, res, do):
    q, k, v, lut, o, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if bwd_impl == "pallas":
        if bwd_recompute:
            # consistent bf16 (o, lse) for the straight-through backward:
            # the quantized forward's lse rescales every recomputed softmax
            # row by exp2(lse_int8 − lse_bf16)
            o, lse = _fwd_pallas(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16), lut, block_m, block_n, scale,
                interpret=interpret)
        # `interpret` is set on the off-TPU fallback path — the backward
        # kernels must run in interpreter mode too (Mosaic can't lower on CPU)
        dq, dk, dv = _bwd_pallas(q, k, v, lut, o, lse, do,
                                 block_m, block_n, scale, interpret=interpret)
    else:
        dq, dk, dv = _bwd_xla(q, k, v, lut, o, lse, do,
                              block_m, block_n, scale)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


int8_block_sparse_attention.defvjp(_int8_fwd, _int8_bwd)
