"""Oracle segment costs on video latents: exact interior-frame interp MSE.

Parity with reference src/selection/oracle_segment_cost.py
(build_oracle_seg_precompute :19, compute_oracle_cost_seg_mse :52): for every
(i, j) anchor pair, the EXACT (non-subsampled) mean squared error between
each interior frame and its linear interpolation from the endpoints —
the ground-truth cost the learned D_phi approximates.

TPU-native: one closed-form vectorized pass instead of chunked loops — for
frame t in segment (i, j): err = ‖x_t − (1−α)x_i − αx_j‖², summed over
interior frames via a precomputed (segment × frame) membership/alpha tensor.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class OracleSegPrecompute(NamedTuple):
    seg_i: jnp.ndarray    # [S]
    seg_j: jnp.ndarray    # [S]
    alpha: jnp.ndarray    # [S, T] lerp weight per frame (0 outside interior)
    member: jnp.ndarray   # [S, T] 1 if frame is interior to the segment
    count: jnp.ndarray    # [S] number of interior frames (≥0)


def build_oracle_seg_precompute(T: int) -> OracleSegPrecompute:
    seg_i, seg_j = [], []
    for i in range(T - 1):
        for j in range(i + 1, T):
            seg_i.append(i)
            seg_j.append(j)
    seg_i = np.asarray(seg_i, np.int32)
    seg_j = np.asarray(seg_j, np.int32)
    t = np.arange(T)
    member = ((t[None, :] > seg_i[:, None]) & (t[None, :] < seg_j[:, None]))
    gap = np.maximum(seg_j - seg_i, 1).astype(np.float32)
    alpha = np.where(member, (t[None, :] - seg_i[:, None]) / gap[:, None], 0.0)
    return OracleSegPrecompute(
        seg_i=jnp.asarray(seg_i), seg_j=jnp.asarray(seg_j),
        alpha=jnp.asarray(alpha.astype(np.float32)),
        member=jnp.asarray(member.astype(np.float32)),
        count=jnp.asarray(member.sum(1).astype(np.float32)),
    )


def compute_oracle_cost_seg_mse(
    z: jnp.ndarray, pre: OracleSegPrecompute, normalize: bool = True
) -> jnp.ndarray:
    """z: [B, T, D] (flattened latents) → cost [B, S].

    cost(i,j) = Σ_{t interior} mean_D (z_t − lerp(z_i, z_j, α_t))²,
    optionally divided by the interior count (mean over frames).

    Computed DIRECTLY via a lax.scan over frames, accumulating the residual
    (z_t − (1−α)z_i − αz_j)² in f32 — an expansion into Gram terms
    (‖z_t‖² + … − 2z_t·z_i …) looks vectorization-friendly but suffers
    catastrophic cancellation at Wan scale (D ≈ 25k, residual ≪ term
    magnitude, and TPU einsum's default reduced precision makes it worse):
    costs could come out negative or mis-ranked, corrupting DP labels.
    Per-step footprint is one [B, S, D] residual.
    """
    import jax

    B, T, D = z.shape
    z32 = z.astype(jnp.float32)
    z_i = z32[:, pre.seg_i]                    # [B,S,D]
    z_j = z32[:, pre.seg_j]

    def body(acc, inp):
        z_t, a_t, m_t = inp                    # [B,D], [S], [S]
        lerp = (1.0 - a_t)[None, :, None] * z_i + a_t[None, :, None] * z_j
        sq = ((z_t[:, None, :] - lerp) ** 2).sum(-1)       # [B,S]
        return acc + sq * m_t[None, :], None

    acc0 = jnp.zeros((B, pre.seg_i.shape[0]), jnp.float32)
    cost, _ = jax.lax.scan(
        body, acc0, (z32.transpose(1, 0, 2), pre.alpha.T, pre.member.T)
    )
    cost = cost / D
    if normalize:
        cost = cost / jnp.maximum(pre.count[None], 1.0)
    return cost
