"""Pure-jnp block-sparse attention: the oracle for the Pallas kernel.

Computes the same math as the Pallas kernel (per-query-block top-k key blocks
selected by a LUT, online-softmax-equivalent normalization) with a gather +
einsum formulation. Used (a) as the numerics oracle in kernel tests and
(b) as the interpret-mode / non-TPU fallback path.

Semantics follow the reference Triton kernel (SLA/kernel.py:21-82): softmax
over the union of LUT'd key blocks only, f32 accumulation, LSE returned in
base-2 (matching the exp2 trick).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_LOG2E = 1.4426950408889634


def block_sparse_attention_reference(
    q: jnp.ndarray,     # [BH, Lq, D]
    k: jnp.ndarray,     # [BH, Lkv, D] (= Lq in the self-attention case)
    v: jnp.ndarray,     # [BH, Lkv, D]
    lut: jnp.ndarray,   # [BH, M_BLOCKS, topk] int32 key-block ids
    block_m: int,
    block_n: int,
    scale: float | None = None,
    kv_len: int | None = None,
    kv_pad_blocks: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (o [BH, Lq, D], lse [BH, Lq] base-2).

    kv_len/kv_pad_blocks mirror the Pallas kernel's cross-length + sentinel
    contract (block_sparse_attention_lse): LUT id ceil(kv_len/block_n)
    addresses an appended zero block whose positions all mask out; rows with
    only sentinel entries return (o=0, lse=-inf-ish) instead of NaN."""
    BH, L, D = q.shape
    Lkv = k.shape[1] if kv_len is None else kv_len
    topk = lut.shape[-1]
    if scale is None:
        scale = D ** -0.5
    m_blocks = lut.shape[1]
    Lp_q = m_blocks * block_m
    n_blocks = -(-Lkv // block_n) + kv_pad_blocks
    Lp_k = n_blocks * block_n

    qp = jnp.pad(q, ((0, 0), (0, Lp_q - L), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Lp_k - k.shape[1]), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Lp_k - v.shape[1]), (0, 0)))
    qb = qp.reshape(BH, m_blocks, block_m, D)
    kb = kp.reshape(BH, n_blocks, block_n, D)
    vb = vp.reshape(BH, n_blocks, block_n, D)

    # gather each query block's top-k key/value blocks: [BH, M, topk, BN, D]
    kg = jnp.take_along_axis(kb[:, None], lut[..., None, None], axis=2)
    vg = jnp.take_along_axis(vb[:, None], lut[..., None, None], axis=2)

    logits = jnp.einsum(
        "bmqd,bmjnd->bmqjn", qb.astype(jnp.float32), kg.astype(jnp.float32)
    ) * scale
    # mask padded key rows (block extends past Lkv; sentinel blocks entirely)
    key_pos = lut[..., None] * block_n + jnp.arange(block_n)  # [BH, M, topk, BN]
    logits = jnp.where(key_pos[:, :, None] < Lkv, logits, -jnp.inf)

    flat = logits.reshape(BH, m_blocks, block_m, topk * block_n)
    mx = jnp.max(flat, axis=-1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)   # all-sentinel rows: no NaN
    p = jnp.exp(flat - mx)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l = jnp.maximum(l, 1e-30)
    o = jnp.einsum(
        "bmqjn,bmjnd->bmqd",
        (p / l).reshape(BH, m_blocks, block_m, topk, block_n),
        vg.astype(jnp.float32),
    )
    lse2 = (mx + jnp.log(l))[..., 0] * _LOG2E  # base-2 LSE, matching exp2 trick
    o = o.reshape(BH, Lp_q, D)[:, :L].astype(q.dtype)
    lse2 = lse2.reshape(BH, Lp_q)[:, :L]
    return o, lse2
