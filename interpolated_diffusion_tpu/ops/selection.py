"""Segment-cost precompute, SNR weights, and DP keypoint selection.

Capability parity with reference src/selection/epiplexity_dp.py: SNR weights
(:22), log-SNR timestep subsampling (:37), all-pairs segment precompute (:50),
segment features (:92, :100), batched interp-MSE segment costs (:120), cost
matrices (:150, :159), DP shortest-path keypoint selection (:171, :200), and
keypoint features (:231, :246).

TPU-native design: the O(K·T²) DP is a lax.scan over k with a fully
vectorized masked min over the [T, T] cost matrix per step (the reference
loops over j in Python); backtracking is a second scan over gathers. Batched
via leading dims, vmap-free.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import make_alpha_bars, make_beta_schedule

_NEG_INF = -1e30
_POS_INF = 1e30


class SegmentPrecompute(NamedTuple):
    """All-pairs (i < j) segment tables; S = T·(T−1)/2 rows."""

    seg_i: jnp.ndarray   # [S] int32 left anchor
    seg_j: jnp.ndarray   # [S] int32 right anchor
    seg_len: jnp.ndarray  # [S] int32 gap
    t_idx: jnp.ndarray   # [S, P] int32 interior sample frames
    alpha: jnp.ndarray   # [S, P] f32 lerp weights of the samples
    weight: jnp.ndarray  # [S] f32 interior/P weight
    seg_id: jnp.ndarray  # [T, T] int32 row id or −1


def build_snr_weights(
    schedule: str, n_train: int, s_min: float, s_max: float, gamma: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    betas = make_beta_schedule(schedule, n_train)
    alpha_bar = make_alpha_bars(betas).alpha_bar
    snr = alpha_bar / jnp.maximum(1.0 - alpha_bar, 1e-8)
    weights = jnp.clip(snr, s_min, s_max) ** gamma
    return snr, weights


def sample_timesteps_log_snr(snr: jnp.ndarray, num_steps: int) -> np.ndarray:
    """Host-side: timesteps spaced uniformly in log-SNR (static output)."""
    snr = np.asarray(snr)
    if num_steps <= 1:
        return np.array([0], dtype=np.int64)
    log_snr = np.log(np.clip(snr, 1e-12, None))
    targets = np.linspace(log_snr.max(), log_snr.min(), num_steps)
    idx = np.abs(log_snr[None, :] - targets[:, None]).argmin(axis=1)
    idx = np.unique(idx)
    if idx.size < num_steps:
        idx = np.unique(np.concatenate([idx, [0, log_snr.shape[0] - 1]]))
    return np.sort(idx)


def build_segment_precompute(T: int, samples_per_seg: int) -> SegmentPrecompute:
    """Host-side static tables for every segment (i, j), i < j."""
    seg_i, seg_j, seg_len, t_idx, alpha, weight = [], [], [], [], [], []
    for i in range(T - 1):
        for j in range(i + 1, T):
            gap = j - i
            seg_i.append(i)
            seg_j.append(j)
            seg_len.append(gap)
            if gap <= 1:
                t_idx.append(np.full((samples_per_seg,), i, dtype=np.int64))
                alpha.append(np.zeros((samples_per_seg,), dtype=np.float32))
                weight.append(0.0)
            else:
                interior = gap - 1
                offs = (np.arange(samples_per_seg, dtype=np.float32) + 0.5) / samples_per_seg
                offs = np.floor(offs * interior).astype(np.int64)
                ts = i + 1 + offs
                t_idx.append(ts)
                alpha.append(((ts - float(i)) / float(gap)).astype(np.float32))
                weight.append(float(interior) / float(samples_per_seg))
    seg_i = np.asarray(seg_i, dtype=np.int32)
    seg_j = np.asarray(seg_j, dtype=np.int32)
    seg_id = np.full((T, T), -1, dtype=np.int32)
    seg_id[seg_i, seg_j] = np.arange(seg_i.shape[0], dtype=np.int32)
    return SegmentPrecompute(
        seg_i=jnp.asarray(seg_i),
        seg_j=jnp.asarray(seg_j),
        seg_len=jnp.asarray(np.asarray(seg_len, dtype=np.int32)),
        t_idx=jnp.asarray(np.stack(t_idx).astype(np.int32)),
        alpha=jnp.asarray(np.stack(alpha)),
        weight=jnp.asarray(np.asarray(weight, dtype=np.float32)),
        seg_id=jnp.asarray(seg_id),
    )


def build_segment_features(T: int, seg_i: jnp.ndarray, seg_j: jnp.ndarray) -> jnp.ndarray:
    denom = float(max(1, T - 1))
    i_norm = seg_i.astype(jnp.float32) / denom
    j_norm = seg_j.astype(jnp.float32) / denom
    return jnp.stack([i_norm, j_norm, j_norm - i_norm], axis=-1)


def build_segment_features_from_idx(
    idx: jnp.ndarray, T: int, seg_feat_dim: int = 3
) -> jnp.ndarray:
    """Per-consecutive-segment [i/T, j/T, gap/T] features from [B, K] idx."""
    if idx.ndim != 2:
        raise ValueError("idx must be [B, K]")
    B, K = idx.shape
    if seg_feat_dim <= 0:
        return jnp.zeros((B, K - 1, 0))
    denom = float(max(1, T - 1))
    i = idx[:, :-1].astype(jnp.float32) / denom
    j = idx[:, 1:].astype(jnp.float32) / denom
    feat = jnp.stack([i, j, j - i], axis=-1)
    if seg_feat_dim == 3:
        return feat
    if seg_feat_dim < 3:
        return feat[:, :, :seg_feat_dim]
    pad = jnp.zeros((B, K - 1, seg_feat_dim - 3), dtype=feat.dtype)
    return jnp.concatenate([feat, pad], axis=-1)


def compute_segment_costs_batch(
    x_pos: jnp.ndarray, precomp: SegmentPrecompute, weight_scale: float = 1.0
) -> jnp.ndarray:
    """Interp-MSE cost per segment: sum over sampled interior frames of
    ‖x_t − lerp(x_i, x_j, α_t)‖² × (interior/P). x_pos: [B, T, ≥2]."""
    B = x_pos.shape[0]
    if x_pos.shape[-1] < 2:
        raise ValueError("x_pos must have at least 2 dims")
    xy = x_pos[..., :2]
    x_i = xy[:, precomp.seg_i]          # [B, S, 2]
    x_j = xy[:, precomp.seg_j]          # [B, S, 2]
    diff_ij = x_j - x_i
    mu = x_i[:, :, None, :] + precomp.alpha[None, :, :, None] * diff_ij[:, :, None, :]
    x_t = xy[:, precomp.t_idx.reshape(-1)].reshape(B, *precomp.t_idx.shape, 2)
    sq = ((x_t - mu) ** 2).sum(axis=-1)      # [B, S, P]
    cost = sq.sum(axis=-1) * precomp.weight[None, :]
    if weight_scale != 1.0:
        cost = cost * weight_scale
    return cost


def build_cost_matrix_from_segments(
    cost_seg: jnp.ndarray, precomp: SegmentPrecompute, T: int
) -> jnp.ndarray:
    """[S] or [B, S] segment costs -> [T, T] / [B, T, T] matrix (inf elsewhere)."""
    if cost_seg.ndim == 1:
        C = jnp.full((T, T), _POS_INF, dtype=cost_seg.dtype)
        return C.at[precomp.seg_i, precomp.seg_j].set(cost_seg)
    B = cost_seg.shape[0]
    C = jnp.full((B, T, T), _POS_INF, dtype=cost_seg.dtype)
    return C.at[:, precomp.seg_i, precomp.seg_j].set(cost_seg)


build_cost_matrix_from_segments_batch = build_cost_matrix_from_segments


def dp_select_indices_batch(C: jnp.ndarray, K: int) -> jnp.ndarray:
    """Min-cost K-anchor path 0 → T−1 through cost matrix C [B, T, T].

    dp[k, j] = min_{i<j} dp[k−1, i] + C[i, j]; returns sorted idx [B, K].
    Vectorized: each k-step is one [B, T, T] masked min (argmin keeps parents).
    """
    if C.ndim == 2:
        return dp_select_indices(C, K)
    B, T, _ = C.shape
    if K < 2:
        raise ValueError("K must be >= 2")
    K = min(K, T)
    tril = jnp.tril(jnp.ones((T, T), dtype=bool))  # i >= j -> invalid
    C_masked = jnp.where(tril[None], _POS_INF, C)

    dp0 = jnp.full((B, T), _POS_INF).at[:, 0].set(0.0)

    def step(dp_prev, _):
        # cand[b, i, j] = dp_prev[b, i] + C[b, i, j]
        cand = dp_prev[:, :, None] + C_masked
        parent = jnp.argmin(cand, axis=1)                 # [B, T]
        dp_new = jnp.take_along_axis(cand, parent[:, None, :], axis=1)[:, 0, :]
        return dp_new, parent

    _, parents = jax.lax.scan(step, dp0, None, length=K - 1)  # parents: [K-1, B, T]

    def back(cur, parent_k):
        prev = jnp.take_along_axis(parent_k, cur[:, None], axis=1)[:, 0]
        return prev, cur

    cur0 = jnp.full((B,), T - 1, dtype=parents.dtype)
    first, rest = jax.lax.scan(back, cur0, parents, reverse=True)
    # rest[k] is the node at position k+1 along the path; first is node 0 (=0).
    idx = jnp.concatenate([first[None], rest.reshape(K - 1, B)], axis=0)
    return jnp.transpose(idx).astype(jnp.int32)


def dp_select_indices(C: jnp.ndarray, K: int) -> jnp.ndarray:
    """Single-sample variant; C: [T, T] -> idx [K]."""
    return dp_select_indices_batch(C[None], K)[0]


def build_kp_feat_batch(idx: jnp.ndarray, T: int) -> jnp.ndarray:
    """Per-keypoint [left-gap, right-gap, t_norm] features from [B, K] idx."""
    if idx.ndim != 2:
        raise ValueError("idx must be [B, K]")
    B, K = idx.shape
    denom = float(max(1, T - 1))
    t_norm = idx.astype(jnp.float32) / denom
    if K > 1:
        gaps = (idx[:, 1:] - idx[:, :-1]).astype(jnp.float32) / denom
        left = jnp.concatenate([jnp.zeros((B, 1)), gaps], axis=1)
        right = jnp.concatenate([gaps, jnp.zeros((B, 1))], axis=1)
    else:
        left = jnp.zeros((B, K))
        right = jnp.zeros((B, K))
    return jnp.stack([left, right, t_norm], axis=-1)


def build_kp_feat(idx: jnp.ndarray, T: int) -> jnp.ndarray:
    return build_kp_feat_batch(idx[None], T)[0]


def build_kp_feat_full(
    idx: jnp.ndarray, T: int, kp_feat_dim: int,
    seg_cost: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Reference `_kp_feat_from_idx` parity (train_keypoints.py:183-204):
    channels [left_gap, right_gap, t_norm, left_cost, right_cost][:kp_feat_dim],
    zero-padded above. The cost channels are the D_phi segment cost of each
    keypoint's left/right consecutive segment (`seg_cost` [B, K-1]); they are
    filled only when kp_feat_dim >= 5 and seg_cost is given — otherwise they
    stay zero, exactly like the reference with dphi_model=None."""
    feat = build_kp_feat_batch(idx, T)
    if kp_feat_dim >= 5 and seg_cost is not None:
        B = idx.shape[0]
        zero = jnp.zeros((B, 1), dtype=seg_cost.dtype)
        left = jnp.concatenate([zero, seg_cost], axis=1)    # 0 at first kp
        right = jnp.concatenate([seg_cost, zero], axis=1)   # 0 at last kp
        feat = jnp.concatenate(
            [feat, left[..., None].astype(feat.dtype),
             right[..., None].astype(feat.dtype)], axis=-1)
    if kp_feat_dim > feat.shape[-1]:
        feat = jnp.pad(feat, ((0, 0), (0, 0), (0, kp_feat_dim - feat.shape[-1])))
    return feat[:, :, :kp_feat_dim]
