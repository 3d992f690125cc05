"""Best-of-N anchor search: collision scoring + chain-DP candidate mixing.

Shared by the samplers' --stage1_best_of path (sample/generate.py,
sample/generate_causal.py) and the Stage-2 trainer's best-of bootstrap
(train/train_interp_levels.py --bootstrap_best_of), so scheduled-sampling
anchors can be drawn from the SAME distribution the best sampler serves
(VERDICT round-3 item 2). No reference counterpart — the reference samples
one anchor set (src/sample/sample_generate.py:974-999).
"""
from __future__ import annotations

import jax.numpy as jnp


def collision_score(x: jnp.ndarray, occ: jnp.ndarray) -> jnp.ndarray:
    """Per-sample occupancy-hit rate of a trajectory: [B, T, >=2], [B, h, w]
    → [B]. The scoring used by the best-of-N anchor search in both samplers
    (same cell/OOB semantics as eval.metrics.compute_metrics_batch)."""
    from ..eval.metrics import _pos_to_cell

    h, w = occ.shape[-2:]
    i, j, oob = _pos_to_cell(x[..., :2], h, w)
    b = jnp.arange(x.shape[0])[:, None]
    return (((occ[b, i, j] > 0.5) | oob).astype(jnp.float32)).mean(axis=1)


def dp_mix_anchors(z_cands: jnp.ndarray, idx: jnp.ndarray, occ: jnp.ndarray,
                    T: int) -> jnp.ndarray:
    """Chain-DP candidate mixing for best-of-N anchors.

    z_cands [N, B, K, D], idx [B, K], occ [B, h, w] → z_mix [B, K, D].
    Because interpolation is linear between consecutive anchors, each
    segment's collision cost depends only on its two bounding anchor values —
    so the best PER-ANCHOR candidate assignment over all N^K combinations is
    a shortest path over a K-node chain with N states (O(K N²), K static).
    Costs: node = the anchor frame's own occupancy hit; edge = hits of the
    strictly-interior frames of the lerp between the chosen pair."""
    from ..eval.metrics import _pos_to_cell

    N, B, K, D = z_cands.shape
    h, w = occ.shape[-2:]
    b_ix = jnp.arange(B)

    # node costs: [N, B, K] — each anchor's own cell
    ni, nj, noob = _pos_to_cell(z_cands[..., :2], h, w)
    node = ((occ[b_ix[None, :, None], ni, nj] > 0.5) | noob).astype(jnp.float32)

    # edge costs per segment, computed INSIDE the DP loop so peak transients
    # stay O(B·N²·T) instead of O(B·K·N²·T): this now also runs inside the
    # Stage-2 trainer's best-of bootstrap at batch 256 / N=16, where the
    # all-segments tensor was ~235 MB of points plus index/hit arrays.
    gap = (idx[:, 1:] - idx[:, :-1]).astype(jnp.float32)        # [B, K-1]
    offs = jnp.arange(T, dtype=jnp.float32)                     # [T]

    def _edge(s):
        """Interior-lerp collision counts for segment s: [B, N_a, N_c]."""
        g = gap[:, s]                                            # [B]
        alpha = offs[None, :] / jnp.maximum(g[:, None], 1.0)     # [B, T]
        interior = (offs[None, :] > 0) & (offs[None, :] < g[:, None])
        pa = jnp.transpose(z_cands[:, :, s, :2], (1, 0, 2))      # [B, N, 2]
        pc = jnp.transpose(z_cands[:, :, s + 1, :2], (1, 0, 2))
        # pts[b, a, c, t, 2]
        pts = (pa[:, :, None, None, :] * (1.0 - alpha[:, None, None, :, None])
               + pc[:, None, :, None, :] * alpha[:, None, None, :, None])
        pi, pj, poob = _pos_to_cell(pts, h, w)
        hit = (occ[b_ix[:, None, None, None], pi, pj] > 0.5) | poob
        return (hit & interior[:, None, None, :]).sum(-1).astype(jnp.float32)

    # forward DP over the chain (K static → python loop stays traceable)
    V = node[:, :, 0].T                                          # [B, N]
    back = []
    for s in range(K - 1):
        tot = V[:, :, None] + _edge(s)                           # [B, N_a, N_c]
        back.append(jnp.argmin(tot, axis=1))                     # [B, N_c]
        V = jnp.min(tot, axis=1) + node[:, :, s + 1].T
    choice = [jnp.argmin(V, axis=1)]                             # last anchor
    for s in range(K - 2, -1, -1):
        choice.append(jnp.take_along_axis(
            back[s], choice[-1][:, None], axis=1)[:, 0])
    choice = jnp.stack(choice[::-1], axis=1)                     # [B, K]

    z_bkd = jnp.transpose(z_cands, (1, 2, 0, 3))                 # [B, K, N, D]
    return jnp.take_along_axis(
        z_bkd, choice[:, :, None, None], axis=2)[:, :, 0]

