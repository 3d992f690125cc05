"""Pallas TPU block-sparse attention (the SLA kernel, TPU-native).

Re-implements the capability of the reference Triton kernels
(SLA/kernel.py:21-320): FlashAttention-style online-softmax forward restricted
to per-query-block top-k key blocks via a LUT, exp2 trick, f32 accumulators;
backward = dQ over LUT blocks + dK/dV with a block-bitmap-gated sweep over
query blocks.

TPU-native design:
  * The LUT is a scalar-prefetch argument (SMEM): BlockSpec index maps read it
    to steer the K/V block DMAs, so Pallas' pipeline machinery double-buffers
    the gathered tiles automatically (grid = (BH, M_BLOCKS, topk), last dim
    sequential/accumulating).
  * All matmuls hit the MXU at [BLOCK, D] × [D, BLOCK] with
    preferred_element_type=f32; m/l running stats live lane-replicated in
    VMEM scratch (min-tile-friendly (BLOCK, 128) shapes).
  * Backward comes in two flavors: full-Pallas kernels (default on TPU) and
    an XLA gather fallback (`bwd_impl="xla"`), both validated against each
    other and against dense attention in tests.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_sparse_reference import block_sparse_attention_reference

_LOG2E = 1.4426950408889634
_NEG_INF = -1e30
_LANES = 128


def _pad_len(L: int, block: int) -> int:
    return -(-L // block) * block


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(
    lut_ref,      # SMEM [BH, M_BLOCKS*topk] (flat: lane-padding-free)
    q_ref,        # VMEM (1, BM, D)
    k_ref,        # VMEM (1, BN, D)  — LUT-gathered
    v_ref,        # VMEM (1, BN, D)
    o_ref,        # VMEM (1, BM, D)
    lse_ref,      # VMEM (1, M_BLOCKS, BM) — full-m block; the m grid dim is
                  #   declared "arbitrary" (sequential) so a Megacore split
                  #   can never give two cores private partial copies of it
    m_scr,        # VMEM (BM, LANES) f32
    l_scr,        # VMEM (BM, LANES) f32
    acc_scr,      # VMEM (BM, D) f32
    *,
    scale: float,
    topk: int,
    L: int,
    block_n: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)

    bh, m = pl.program_id(0), pl.program_id(1)
    n_block = lut_ref[bh, m * topk + j]
    key_pos = n_block * block_n + jax.lax.broadcasted_iota(
        jnp.int32, qk.shape, dimension=1
    )
    qk = jnp.where(key_pos < L, qk, _NEG_INF)

    m_prev = m_scr[:, :1]                      # [BM, 1]
    local_m = jnp.max(qk, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, local_m)
    p = jnp.exp2(qk - m_new)                   # [BM, BN]
    alpha = jnp.exp2(m_prev - m_new)           # [BM, 1]
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


def _fwd_pallas(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, lut: jnp.ndarray,
    block_m: int, block_n: int, scale: float, interpret: bool = False,
    kv_len: Optional[int] = None, kv_pad_blocks: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kv_len decouples the key-position mask bound from the query length
    (cross/ring attention); kv_pad_blocks appends that many EXTRA zero K/V
    blocks past the padded kv length, so a LUT entry of n_kv_blocks is a
    fully-masked in-bounds sentinel (ring SLA points off-shard blocks at it —
    its keys sit at positions >= kv_len and mask to zero probability)."""
    BH, L, D = q.shape
    Lkv = k.shape[1] if kv_len is None else kv_len
    m_blocks = lut.shape[1]
    topk = lut.shape[-1]
    Lq = m_blocks * block_m
    Lk = _pad_len(Lkv, block_n) + kv_pad_blocks * block_n
    qp = jnp.pad(q, ((0, 0), (0, Lq - L), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Lk - k.shape[1]), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Lk - v.shape[1]), (0, 0)))

    grid = (BH, m_blocks, topk)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, topk=topk, L=Lkv, block_n=block_n
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
            jax.ShapeDtypeStruct((BH, Lq, D), q.dtype),
            jax.ShapeDtypeStruct((BH, m_blocks, block_m), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # m must be sequential: every m iteration writes into the SAME
            # full-m lse block, which under a parallel Megacore split would
            # leave each core with a private partially-written copy
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lut.reshape(BH, m_blocks * topk), qp, kp, vp)
    return o[:, :L], lse.reshape(BH, Lq)[:, :L]


def _fwd_pallas_interpret(q, k, v, lut, block_m, block_n, scale):
    """Interpreter-mode forward (CPU test path for the Pallas kernel)."""
    return _fwd_pallas(q, k, v, lut, block_m, block_n, scale, interpret=True)


# ---------------------------------------------------------------------------
# dense (full-attention / flash) kernel variants — no LUT, so no SMEM limits
# at long sequence lengths; n_block is simply the sequential grid index.
# ---------------------------------------------------------------------------

def _fwd_kernel_dense(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale: float, n_blocks: int, L: int, block_n: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    qk = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (scale * _LOG2E)
    m = pl.program_id(1)
    key_pos = j * block_n + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
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

    @pl.when(j == n_blocks - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0, m] = m_scr[:, 0] + jnp.log2(l[:, 0])


def _dq_kernel_dense(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, scale: float, n_blocks: int, L: int, block_n: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)
    m = pl.program_id(1)
    key_pos = j * block_n + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
    qk = jnp.where(key_pos < L, qk, _NEG_INF)
    p = jnp.exp2(qk - lse_ref[0, m][:, None])
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, m][:, None]) * scale
    dq_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkdv_kernel_dense(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale: float, m_blocks: int, L: int, block_n: int,
):
    m = pl.program_id(2)

    @pl.when(m == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    n = pl.program_id(1)
    k = k_ref[0]
    q = q_ref[0]
    qk_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)
    key_pos = n * block_n + jax.lax.broadcasted_iota(jnp.int32, qk_t.shape, 0)
    qk_t = jnp.where(key_pos < L, qk_t, _NEG_INF)
    p_t = jnp.exp2(qk_t - lse_ref[0, m][None, :])
    dv_scr[...] += jax.lax.dot_general(
        p_t.astype(do_ref.dtype), do_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_t = jax.lax.dot_general(
        v_ref[0], do_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds_t = p_t * (dp_t - delta_ref[0, m][None, :]) * scale
    dk_scr[...] += jax.lax.dot_general(
        ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(m == m_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _fwd_pallas_dense(q, k, v, block_m, block_n, scale, interpret=False):
    BH, L, D = q.shape
    L_k = k.shape[1]
    m_blocks = _pad_len(L, block_m) // block_m
    n_blocks = _pad_len(L_k, block_n) // block_n
    Lq, Lk = m_blocks * block_m, n_blocks * block_n
    qp = jnp.pad(q, ((0, 0), (0, Lq - L), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Lk - L_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Lk - L_k), (0, 0)))
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_dense, scale=scale, n_blocks=n_blocks,
                          L=L_k, block_n=block_n),
        grid=(BH, m_blocks, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block_m, D), lambda bh, m, j: (bh, m, 0)),
            pl.BlockSpec((1, block_n, D), lambda bh, m, j: (bh, j, 0)),
            pl.BlockSpec((1, block_n, D), lambda bh, m, j: (bh, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_m, D), lambda bh, m, j: (bh, m, 0)),
            pl.BlockSpec((1, m_blocks, block_m), lambda bh, m, j: (bh, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, _LANES), jnp.float32),
            pltpu.VMEM((block_m, _LANES), jnp.float32),
            pltpu.VMEM((block_m, D), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lq, D), q.dtype),
            jax.ShapeDtypeStruct((BH, m_blocks, block_m), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # m sequential: shared full-m lse block (see _fwd_pallas note)
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return o[:, :L], lse.reshape(BH, Lq)[:, :L]


def _bwd_pallas_dense(q, k, v, o, lse, do, block_m, block_n, scale,
                      interpret=False):
    BH, L, D = q.shape
    L_k = k.shape[1]
    m_blocks = _pad_len(L, block_m) // block_m
    n_blocks = _pad_len(L_k, block_n) // block_n
    Lq, Lk = m_blocks * block_m, n_blocks * block_n
    qp = jnp.pad(q, ((0, 0), (0, Lq - L), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Lk - L_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Lk - L_k), (0, 0)))
    dop = jnp.pad(do, ((0, 0), (0, Lq - L), (0, 0)))
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    deltap = jnp.pad(delta, ((0, 0), (0, Lq - L))).reshape(BH, m_blocks, block_m)
    lsep = jnp.pad(lse, ((0, 0), (0, Lq - L)), constant_values=1.0)
    lsep = lsep.reshape(BH, m_blocks, block_m)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel_dense, scale=scale, n_blocks=n_blocks,
                          L=L_k, block_n=block_n),
        grid=(BH, m_blocks, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block_m, D), lambda bh, m, j: (bh, m, 0)),
            pl.BlockSpec((1, block_n, D), lambda bh, m, j: (bh, j, 0)),
            pl.BlockSpec((1, block_n, D), lambda bh, m, j: (bh, j, 0)),
            pl.BlockSpec((1, block_m, D), lambda bh, m, j: (bh, m, 0)),
            pl.BlockSpec((1, m_blocks, block_m), lambda bh, m, j: (bh, 0, 0)),
            pl.BlockSpec((1, m_blocks, block_m), lambda bh, m, j: (bh, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, block_m, D), lambda bh, m, j: (bh, m, 0))],
        scratch_shapes=[pltpu.VMEM((block_m, D), jnp.float32)],
        out_shape=[jax.ShapeDtypeStruct((BH, Lq, D), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)[0]

    dk, dv = pl.pallas_call(
        functools.partial(_dkdv_kernel_dense, scale=scale, m_blocks=m_blocks,
                          L=L_k, block_n=block_n),
        grid=(BH, n_blocks, m_blocks),
        in_specs=[
            pl.BlockSpec((1, block_m, D), lambda bh, n, m: (bh, m, 0)),
            pl.BlockSpec((1, block_n, D), lambda bh, n, m: (bh, n, 0)),
            pl.BlockSpec((1, block_n, D), lambda bh, n, m: (bh, n, 0)),
            pl.BlockSpec((1, block_m, D), lambda bh, n, m: (bh, m, 0)),
            pl.BlockSpec((1, m_blocks, block_m), lambda bh, n, m: (bh, 0, 0)),
            pl.BlockSpec((1, m_blocks, block_m), lambda bh, n, m: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, D), lambda bh, n, m: (bh, n, 0)),
            pl.BlockSpec((1, block_n, D), lambda bh, n, m: (bh, n, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_n, D), jnp.float32),
            pltpu.VMEM((block_n, D), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lk, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Lk, D), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)
    return dq[:, :L], dk[:, :L_k], dv[:, :L_k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    block_m: int = 512, block_n: int = 1024,
    scale: Optional[float] = None, interpret: bool = False,
) -> jnp.ndarray:
    """Full (exact) attention via the dense Pallas kernels — O(L) memory.

    Used for long-sequence self-attention where XLA dense attention would
    materialize the [H, L, L] logits (e.g. Wan-scale L≈33k → 51 GB).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    o, _ = _fwd_pallas_dense(q, k, v, block_m, block_n, scale, interpret)
    return o


def _flash_fwd(q, k, v, block_m, block_n, scale, interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    o, lse = _fwd_pallas_dense(q, k, v, block_m, block_n, scale, interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd(block_m, block_n, scale, interpret, res, do):
    q, k, v, o, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    dq, dk, dv = _bwd_pallas_dense(q, k, v, o, lse, do, block_m, block_n,
                                   scale, interpret)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _dq_kernel(
    lut_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    dq_scr, *, scale: float, topk: int, L: int, block_n: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)
    bh, m = pl.program_id(0), pl.program_id(1)
    n_block = lut_ref[bh, m * topk + j]
    key_pos = n_block * block_n + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
    qk = jnp.where(key_pos < L, qk, _NEG_INF)
    p = jnp.exp2(qk - lse_ref[0, m][:, None])         # [BM, BN]
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, m][:, None]) * scale
    dq_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == topk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkdv_kernel(
    lut_ref,    # SMEM [BH, M_BLOCKS*topk] — the same flat LUT the fwd uses
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale: float, m_blocks: int, L: int, block_n: int, topk: int,
):
    m = pl.program_id(2)

    @pl.when(m == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    bh, n = pl.program_id(0), pl.program_id(1)

    # membership COUNT: how many times does query block m attend to key
    # block n? (the reference's KBID bitmap, SLA/kernel.py:167-237, realized
    # as a scalar scan over the SMEM LUT row — topk ≤ ~32 scalar reads).
    # Counting (not a boolean) keeps dk/dv consistent with the forward and
    # dq kernels when a LUT row contains duplicated block ids (e.g. rows
    # padded by repeating an id): each occurrence contributes once there,
    # so it must be weighted here too.
    def scan_lut(j, cnt):
        return cnt + (lut_ref[bh, m * topk + j] == n).astype(jnp.int32)

    count = jax.lax.fori_loop(0, topk, scan_lut, 0)

    @pl.when(count > 0)
    def _compute():
        k = k_ref[0]
        q = q_ref[0]
        qk_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)                               # [BN, BM]
        key_pos = n * block_n + jax.lax.broadcasted_iota(jnp.int32, qk_t.shape, 0)
        qk_t = jnp.where(key_pos < L, qk_t, _NEG_INF)
        p_t = jnp.exp2(qk_t - lse_ref[0, m][None, :])      # [BN, BM]
        p_t = p_t * count.astype(jnp.float32)
        dv_scr[...] += jax.lax.dot_general(
            p_t.astype(do_ref.dtype), do_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp_t = jax.lax.dot_general(
            v_ref[0], do_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [BN, BM]
        ds_t = p_t * (dp_t - delta_ref[0, m][None, :]) * scale
        dk_scr[...] += jax.lax.dot_general(
            ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(m == m_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_pallas(
    q, k, v, lut, o, lse, do, block_m: int, block_n: int, scale: float,
    interpret: bool = False,
):
    BH, L, D = q.shape
    m_blocks = lut.shape[1]
    topk = lut.shape[-1]
    n_blocks = _pad_len(L, block_n) // block_n
    Lq = m_blocks * block_m
    Lk = n_blocks * block_n
    qp = jnp.pad(q, ((0, 0), (0, Lq - L), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Lk - L), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Lk - L), (0, 0)))
    dop = jnp.pad(do, ((0, 0), (0, Lq - L), (0, 0)))
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    deltap = jnp.pad(delta, ((0, 0), (0, Lq - L))).reshape(BH, m_blocks, block_m)
    lsep = jnp.pad(lse, ((0, 0), (0, Lq - L)), constant_values=1.0)
    lsep = lsep.reshape(BH, m_blocks, block_m)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, topk=topk, L=L, block_n=block_n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, m_blocks, topk),
            in_specs=[
                pl.BlockSpec((1, block_m, D), lambda bh, m, j, lut: (bh, m, 0)),
                pl.BlockSpec((1, block_n, D), lambda bh, m, j, lut: (bh, lut[bh, m * topk + j], 0)),
                pl.BlockSpec((1, block_n, D), lambda bh, m, j, lut: (bh, lut[bh, m * topk + j], 0)),
                pl.BlockSpec((1, block_m, D), lambda bh, m, j, lut: (bh, m, 0)),
                pl.BlockSpec((1, m_blocks, block_m), lambda bh, m, j, lut: (bh, 0, 0)),
                pl.BlockSpec((1, m_blocks, block_m), lambda bh, m, j, lut: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_m, D), lambda bh, m, j, lut: (bh, m, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((block_m, D), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((BH, Lq, D), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lut.reshape(BH, m_blocks * topk), qp, kp, vp, dop, lsep, deltap)[0]

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkdv_kernel, scale=scale, m_blocks=m_blocks, L=L,
            block_n=block_n, topk=topk,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, n_blocks, m_blocks),
            in_specs=[
                pl.BlockSpec((1, block_m, D), lambda bh, n, m, lut: (bh, m, 0)),
                pl.BlockSpec((1, block_n, D), lambda bh, n, m, lut: (bh, n, 0)),
                pl.BlockSpec((1, block_n, D), lambda bh, n, m, lut: (bh, n, 0)),
                pl.BlockSpec((1, block_m, D), lambda bh, n, m, lut: (bh, m, 0)),
                pl.BlockSpec((1, m_blocks, block_m), lambda bh, n, m, lut: (bh, 0, 0)),
                pl.BlockSpec((1, m_blocks, block_m), lambda bh, n, m, lut: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_n, D), lambda bh, n, m, lut: (bh, n, 0)),
                pl.BlockSpec((1, block_n, D), lambda bh, n, m, lut: (bh, n, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_n, D), jnp.float32),
                pltpu.VMEM((block_n, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lk, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Lk, D), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lut.reshape(BH, m_blocks * topk), qp, kp, vp, dop, lsep, deltap)
    return dq[:, :L], dk[:, :L], dv[:, :L]


# ---------------------------------------------------------------------------
# XLA fallback backward (gather formulation), used for oracle tests & CPU
# ---------------------------------------------------------------------------

def _bwd_xla(q, k, v, lut, o, lse, do, block_m, block_n, scale):
    def fwd_from_inputs(q, k, v):
        o, _ = block_sparse_attention_reference(q, k, v, lut, block_m, block_n, scale)
        return o.astype(jnp.float32)

    _, vjp = jax.vjp(fwd_from_inputs, q, k, v)
    return vjp(do.astype(jnp.float32))


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def block_sparse_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lut: jnp.ndarray,
    block_m: int = 128,
    block_n: int = 128,
    scale: Optional[float] = None,
    impl: str = "pallas",
    bwd_impl: str = "pallas",
) -> jnp.ndarray:
    """Block-sparse attention o[i] = softmax(q_i · K_{LUT(i)}) V_{LUT(i)}.

    q/k/v: [BH, L, D]; lut: [BH, M_BLOCKS, topk] int32 key-block indices with
    M_BLOCKS = ceil(L / block_m). Returns [BH, L, D].
    """
    o, _ = _fwd_impl(q, k, v, lut, block_m, block_n, scale, impl)
    return o


def block_sparse_attention_lse(
    q: jnp.ndarray,       # [BH, Lq, D]
    k: jnp.ndarray,       # [BH, Lkv, D] — independent length (cross/ring)
    v: jnp.ndarray,
    lut: jnp.ndarray,     # [BH, ceil(Lq/block_m), topk] int32
    block_m: int = 128,
    block_n: int = 128,
    scale: Optional[float] = None,
    impl: str = "pallas",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Block-sparse attention returning (o, lse) with SENTINEL support:
    a LUT entry equal to ceil(Lkv/block_n) selects an appended all-zero,
    fully-position-masked block — it contributes nothing, and rows whose
    entries are ALL sentinels come out (o=0, lse≈-inf). This is the ring-SLA
    hop primitive (parallel/ring_sla.py): off-shard LUT entries become
    sentinels and the per-hop (o, lse) pairs merge in log-space. `lse` is
    base-2, matching the kernel's exp2 trick. Forward-only (no custom_vjp);
    the training path keeps per-device SLA or ring dense attention.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    kv_len = k.shape[1]
    if impl == "pallas":
        return _fwd_pallas(q, k, v, lut, block_m, block_n, scale,
                           kv_len=kv_len, kv_pad_blocks=1)
    return block_sparse_attention_reference(
        q, k, v, lut, block_m, block_n, scale, kv_len=kv_len, kv_pad_blocks=1)


def _fwd_impl(q, k, v, lut, block_m, block_n, scale, impl):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "pallas":
        return _fwd_pallas(q, k, v, lut, block_m, block_n, scale)
    return block_sparse_attention_reference(q, k, v, lut, block_m, block_n, scale)


def _bsa_fwd(q, k, v, lut, block_m, block_n, scale, impl, bwd_impl):
    o, lse = _fwd_impl(q, k, v, lut, block_m, block_n, scale, impl)
    return o, (q, k, v, lut, o, lse)


def _bsa_bwd(block_m, block_n, scale, impl, bwd_impl, res, do):
    q, k, v, lut, o, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if bwd_impl == "pallas":
        # impl != "pallas" means we're on the off-TPU fallback path — run the
        # backward kernels in interpreter mode (Mosaic can't lower on CPU)
        dq, dk, dv = _bwd_pallas(q, k, v, lut, o, lse, do, block_m, block_n,
                                 scale, interpret=impl != "pallas")
    else:
        dq, dk, dv = _bwd_xla(q, k, v, lut, o, lse, do, block_m, block_n, scale)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


block_sparse_attention.defvjp(_bsa_fwd, _bsa_bwd)
