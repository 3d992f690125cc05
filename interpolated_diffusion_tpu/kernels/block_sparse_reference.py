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
    q: jnp.ndarray,     # [BH, L, D]
    k: jnp.ndarray,     # [BH, L, D]
    v: jnp.ndarray,     # [BH, L, D]
    lut: jnp.ndarray,   # [BH, M_BLOCKS, topk] int32 key-block ids
    block_m: int,
    block_n: int,
    scale: float | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (o [BH, L, D], lse [BH, L] base-2)."""
    BH, L, D = q.shape
    topk = lut.shape[-1]
    if scale is None:
        scale = D ** -0.5
    m_blocks = lut.shape[1]
    Lp_q = m_blocks * block_m
    n_blocks = -(-L // block_n)
    Lp_k = n_blocks * block_n

    qp = jnp.pad(q, ((0, 0), (0, Lp_q - L), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, Lp_k - L), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, Lp_k - L), (0, 0)))
    qb = qp.reshape(BH, m_blocks, block_m, D)
    kb = kp.reshape(BH, n_blocks, block_n, D)
    vb = vp.reshape(BH, n_blocks, block_n, D)

    # gather each query block's top-k key/value blocks: [BH, M, topk, BN, D]
    kg = jnp.take_along_axis(kb[:, None], lut[..., None, None], axis=2)
    vg = jnp.take_along_axis(vb[:, None], lut[..., None, None], axis=2)

    logits = jnp.einsum(
        "bmqd,bmjnd->bmqjn", qb.astype(jnp.float32), kg.astype(jnp.float32)
    ) * scale
    # mask padded key rows (block extends past L)
    key_pos = lut[..., None] * block_n + jnp.arange(block_n)  # [BH, M, topk, BN]
    logits = jnp.where(key_pos[:, :, None] < L, logits, -jnp.inf)

    flat = logits.reshape(BH, m_blocks, block_m, topk * block_n)
    mx = jnp.max(flat, axis=-1, keepdims=True)
    p = jnp.exp(flat - mx)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum(
        "bmqjn,bmjnd->bmqd",
        (p / l).reshape(BH, m_blocks, block_m, topk, block_n),
        vg.astype(jnp.float32),
    )
    lse2 = (mx + jnp.log(l))[..., 0] * _LOG2E  # base-2 LSE, matching exp2 trick
    o = o.reshape(BH, Lp_q, D)[:, :L].astype(q.dtype)
    lse2 = lse2.reshape(BH, Lp_q)[:, :L]
    return o, lse2
