"""Training batch construction for Stage-1 (keypoints) and Stage-2 (levels).

Capability parity with the batch builders in reference
src/train/train_keypoints.py (_build_known_mask_values :99,
_build_keypoint_batch :122) and src/train/train_interp_levels.py
(build_interp_level_batch :227, build_interp_adjacent_batch :294,
_corrupt_from_anchors :458, _distance_alpha :444, sigma/jitter level
schedules :390-456).

TPU-native design: the reference's per-level Python loop with boolean row
selection becomes "compute every level, gather by sampled level" — levels is
tiny (≤8) and every branch has static shapes, so one jitted program covers the
whole builder. Randomness is explicit key threading.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.keyframes import (
    build_nested_masks_batch,
    interpolate_from_indices,
    recompute_velocity_channels,
    sample_fixed_k_indices_batch,
)
from ..ops.normalize import logit_pos


# ---------------------------------------------------------------------------
# Stage-1 keypoint batches
# ---------------------------------------------------------------------------

def gather_keypoints(x0: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x0 [B, T, D], idx [B, K] -> [B, K, D]."""
    return jnp.take_along_axis(x0, idx[..., None], axis=1)


def build_known_mask_values(
    idx: jnp.ndarray,
    cond: Dict[str, jnp.ndarray],
    D: int,
    T: int,
    clamp_endpoints: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Known-endpoint mask/values over keypoint slots.

    Position dims (0:2) of tokens sitting at frame 0 / frame T−1 are known and
    clamped to start/goal; velocity dims stay free.
    """
    B, K = idx.shape
    known_mask = jnp.zeros((B, K, D), dtype=bool)
    known_values = jnp.zeros((B, K, D), dtype=jnp.float32)
    if clamp_endpoints and D >= 2:
        if "start_goal" not in cond:
            raise ValueError("clamp_endpoints=True but start_goal missing from cond")
        start = cond["start_goal"][:, :2]
        goal = cond["start_goal"][:, 2:]
        mask_start = (idx == 0)[..., None]
        mask_goal = (idx == T - 1)[..., None]
        pos_mask = jnp.broadcast_to(mask_start | mask_goal, (B, K, 2))
        known_mask = known_mask.at[:, :, :2].set(pos_mask)
        pos_vals = jnp.where(mask_start, start[:, None, :], 0.0)
        pos_vals = jnp.where(mask_goal, goal[:, None, :], pos_vals)
        known_values = known_values.at[:, :, :2].set(pos_vals)
    return known_mask, known_values


def build_keypoint_batch(
    key: jax.Array,
    x0: jnp.ndarray,
    K: int,
    cond: Dict[str, jnp.ndarray],
    logit_space: bool = False,
    logit_eps: float = 1e-5,
    clamp_endpoints: bool = True,
    idx_override: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (z0 [B,K,D], idx [B,K], known_mask [B,K,D], known_values)."""
    B, T, D = x0.shape
    if idx_override is None:
        idx, _ = sample_fixed_k_indices_batch(key, B, T, K, ensure_endpoints=True)
    else:
        idx = idx_override
    z0 = gather_keypoints(x0, idx)
    known_mask, known_values = build_known_mask_values(idx, cond, D, T, clamp_endpoints)
    if logit_space:
        z0 = logit_pos(z0, eps=logit_eps)
        known_values = logit_pos(known_values, eps=logit_eps)
    return z0, idx, known_mask, known_values


# ---------------------------------------------------------------------------
# Stage-2 level corruption
# ---------------------------------------------------------------------------

def compute_sigma_for_level(
    K_s: int, K_min: int, sigma_max: float, sigma_min: float, sigma_pow: float
) -> float:
    """σ(K_s) = σ_max · (K_min/K_s)^pow, clipped to [σ_min, σ_max]. Host-side."""
    if sigma_max <= 0.0:
        return 0.0
    ratio = float(max(1, K_min)) / float(max(1, K_s))
    sigma = float(sigma_max) * (ratio ** float(sigma_pow))
    return max(float(sigma_min), min(float(sigma_max), sigma))


def compute_jitter_for_level(K_s: int, K_min: int, jitter_max: int, jitter_pow: float) -> int:
    if jitter_max <= 0:
        return 0
    ratio = float(max(1, K_min)) / float(max(1, K_s))
    jitter = int(round(float(jitter_max) * (ratio ** float(jitter_pow))))
    return max(0, min(int(jitter_max), jitter))


def parse_policy_mix(spec: str) -> List[Tuple[str, float]]:
    """Parse "dp:0.7,uniform:0.2,random:0.1" into normalized (name, w) pairs."""
    if not spec:
        return []
    mix = []
    for part in (p.strip() for p in spec.split(",") if p.strip()):
        if ":" not in part:
            raise ValueError(f"Invalid policy mix entry: {part}")
        name, weight = part.split(":", 1)
        mix.append((name.strip(), float(weight)))
    total = sum(w for _, w in mix)
    if total <= 0:
        raise ValueError("policy mix weights must sum to > 0")
    return [(n, w / total) for n, w in mix]


# single implementation in ops/video_keyframes.py (was duplicated here)
from ..ops.video_keyframes import distance_alpha  # noqa: E402,F401


def corrupt_from_anchors(
    key: jax.Array,
    source: jnp.ndarray,
    idx: jnp.ndarray,
    T: int,
    sigma: float,
    anchor_sigma: float,
    index_jitter: int,
    index_jitter_prob: float,
    mode: str,
    clamp_endpoints: bool,
    recompute_velocity: bool,
    return_prenoise: bool = False,
):
    """Interp-corrupt with optional anchor-index jitter, anchor-value noise,
    and distance-scaled Gaussian noise on the interpolated positions.

    With return_prenoise, also returns the interpolation BEFORE the iid
    per-frame dist/gauss noise (anchor jitter + anchor noise still applied) —
    the segment-smooth signal a velocity recompute should read (see
    _level_interp)."""
    B, _, D = source.shape
    K = idx.shape[1]
    k_jit, k_use, k_anchor, k_noise = jax.random.split(key, 4)
    idx_j = idx
    if index_jitter > 0 and index_jitter_prob > 0.0:
        jit = jax.random.randint(k_jit, (B, K), -index_jitter, index_jitter + 1)
        use = jax.random.uniform(k_use, (B, K)) < float(index_jitter_prob)
        if clamp_endpoints:
            use = use & (idx != 0) & (idx != T - 1)
        idx_j = jnp.clip(jnp.where(use, idx + jit, idx), 0, T - 1)
    # Values come from the (possibly jittered) frames, but anchors keep their
    # original positions in the interpolation (matches reference :458-500).
    vals = gather_keypoints(source, idx_j)
    if anchor_sigma > 0.0:
        noise = jax.random.normal(k_anchor, (B, K, 2), dtype=source.dtype) * float(anchor_sigma)
        if clamp_endpoints:
            end = ((idx == 0) | (idx == T - 1))[..., None]
            noise = jnp.where(end, 0.0, noise)
        vals = vals.at[:, :, :2].add(noise)
    x = interpolate_from_indices(idx, vals, T, recompute_velocity=False)
    x_prenoise = x
    if sigma > 0.0:
        alpha = distance_alpha(idx, T) if mode == "dist" else 1.0
        noise = jax.random.normal(k_noise, (B, T, 2), dtype=source.dtype) * float(sigma)
        x = x.at[:, :, :2].add(noise * alpha)
    if recompute_velocity and D == 4:
        x = recompute_velocity_channels(x, T)
    if return_prenoise:
        return x, x_prenoise
    return x


def _level_interp(
    key: jax.Array,
    source: jnp.ndarray,
    idx_s: jnp.ndarray,
    T: int,
    K_min: int,
    recompute_velocity: bool,
    corrupt_mode: str,
    corrupt_sigma_max: float,
    corrupt_sigma_min: float,
    corrupt_sigma_pow: float,
    corrupt_anchor_frac: float,
    corrupt_index_jitter_max: int,
    corrupt_index_jitter_prob: float,
    corrupt_index_jitter_pow: float,
    clamp_endpoints: bool,
    pos_clip: bool,
    pos_clip_min: float,
    pos_clip_max: float,
    corrupt_vel: bool = False,
) -> jnp.ndarray:
    K_s = idx_s.shape[1]
    if corrupt_mode != "none":
        sigma = compute_sigma_for_level(K_s, K_min, corrupt_sigma_max, corrupt_sigma_min, corrupt_sigma_pow)
        anchor_sigma = sigma * float(corrupt_anchor_frac)
        jitter = compute_jitter_for_level(K_s, K_min, corrupt_index_jitter_max, corrupt_index_jitter_pow)
        xs, xs_prenoise = corrupt_from_anchors(
            key, source, idx_s, T, sigma, anchor_sigma, jitter,
            corrupt_index_jitter_prob, corrupt_mode, clamp_endpoints,
            recompute_velocity=False, return_prenoise=True,
        )
    else:
        vals = gather_keypoints(source, idx_s)
        xs = interpolate_from_indices(idx_s, vals, T, recompute_velocity=False)
        xs_prenoise = xs
    if pos_clip:
        xs = xs.at[..., :2].set(jnp.clip(xs[..., :2], pos_clip_min, pos_clip_max))
        xs_prenoise = xs_prenoise.at[..., :2].set(
            jnp.clip(xs_prenoise[..., :2], pos_clip_min, pos_clip_max))
    # Velocities from the clipped positions — the reference recomputes before
    # its position clip (train_interp_levels.py:287,:503), which lets an
    # out-of-range position excursion survive ×T-amplified in the velocity
    # channels; clipping first keeps every channel bounded.
    #
    # By default (corrupt_vel=False) velocities read the PRE-iid-noise
    # positions: the iid dist/gauss noise simulates Stage-1 anchor error, but
    # a real anchor-error interpolation is segment-smooth — fd×T of iid noise
    # is a σ·√2·T ≈ 3.6-rms artifact (σ=0.02, T=128) that neither clean data
    # nor sampling-time inputs ever contain, and it dominated the D=4 Stage-2
    # loss as unlearnable target noise (the round-2 D4RL divergence's third
    # leg). corrupt_vel=True restores the reference behavior for ablation.
    if recompute_velocity and source.shape[-1] == 4:
        vsrc = xs if corrupt_vel else xs_prenoise
        xs = jnp.concatenate(
            [xs[..., :2], recompute_velocity_channels(vsrc, T)[..., 2:]],
            axis=-1)
    return xs


def build_interp_level_batch(
    key: jax.Array,
    x0: jnp.ndarray,
    K_min: int,
    levels: int,
    recompute_velocity: bool = False,
    x0_override: Optional[jnp.ndarray] = None,
    masks_levels: Optional[jnp.ndarray] = None,
    idx_levels: Optional[List[jnp.ndarray]] = None,
    s_idx: Optional[jnp.ndarray] = None,
    corrupt_mode: str = "none",
    corrupt_sigma_max: float = 0.0,
    corrupt_sigma_min: float = 0.0,
    corrupt_sigma_pow: float = 1.0,
    corrupt_anchor_frac: float = 0.0,
    corrupt_index_jitter_max: int = 0,
    corrupt_index_jitter_prob: float = 0.0,
    corrupt_index_jitter_pow: float = 1.0,
    clamp_endpoints: bool = True,
    pos_clip: bool = False,
    pos_clip_min: float = 0.0,
    pos_clip_max: float = 1.0,
    corrupt_vel: bool = False,
):
    """x_s = Interp(x0 | M_s) at a sampled level s per sample.

    Returns (x_s, mask_s, s_idx, masks_levels, idx_levels). All levels are
    computed with static shapes, then the sampled level is gathered.
    """
    B, T, D = x0.shape
    k_masks, k_s, k_lvls = jax.random.split(key, 3)
    if masks_levels is None or idx_levels is None:
        masks_levels, idx_levels = build_nested_masks_batch(k_masks, B, T, K_min, levels)
    if s_idx is None:
        s_idx = jax.random.randint(k_s, (B,), 1, levels + 1)
    source = x0_override if x0_override is not None else x0
    lvl_keys = jax.random.split(k_lvls, levels + 1)
    corr = dict(
        corrupt_mode=corrupt_mode,
        corrupt_sigma_max=corrupt_sigma_max,
        corrupt_sigma_min=corrupt_sigma_min,
        corrupt_sigma_pow=corrupt_sigma_pow,
        corrupt_anchor_frac=corrupt_anchor_frac,
        corrupt_index_jitter_max=corrupt_index_jitter_max,
        corrupt_index_jitter_prob=corrupt_index_jitter_prob,
        corrupt_index_jitter_pow=corrupt_index_jitter_pow,
        clamp_endpoints=clamp_endpoints,
        pos_clip=pos_clip,
        pos_clip_min=pos_clip_min,
        pos_clip_max=pos_clip_max,
        corrupt_vel=corrupt_vel,
    )
    x_all = jnp.stack(
        [
            _level_interp(lvl_keys[s], source, idx_levels[s], T, K_min, recompute_velocity, **corr)
            for s in range(1, levels + 1)
        ],
        axis=0,
    )  # [levels, B, T, D]
    b = jnp.arange(B)
    x_s = x_all[s_idx - 1, b]
    mask_s = jnp.take_along_axis(masks_levels, s_idx[:, None, None], axis=1)[:, 0]
    return x_s, mask_s, s_idx, masks_levels, idx_levels


def build_interp_adjacent_batch(
    key: jax.Array,
    x0: jnp.ndarray,
    K_min: int,
    levels: int,
    recompute_velocity: bool = False,
    x0_override: Optional[jnp.ndarray] = None,
    masks_levels: Optional[jnp.ndarray] = None,
    idx_levels: Optional[List[jnp.ndarray]] = None,
    s_idx: Optional[jnp.ndarray] = None,
    clean_target: bool = True,
    **corruption,
):
    """Adjacent-level pair (x_s, x_{s−1}) for delta-prediction training.

    Returns (x_s, x_prev, mask_s, mask_prev, s_idx, masks_levels, idx_levels).

    clean_target (default, departs from reference :328-374): the target level
    x_{s−1} is the CLEAN interpolation — no independent corruption draw. The
    corruption noise is zero-mean, so E[x_prev|anchors] is unchanged, but an
    independently-noised target adds pure variance the model can never fit
    (and ×T-amplified variance in recomputed velocity channels). Targets
    should point AT the manifold, not at another noisy sample of it.
    clean_target=False restores the reference's double-corruption behavior.
    """
    B, T, D = x0.shape
    k_masks, k_s, k_lvls = jax.random.split(key, 3)
    if masks_levels is None or idx_levels is None:
        masks_levels, idx_levels = build_nested_masks_batch(k_masks, B, T, K_min, levels)
    if s_idx is None:
        s_idx = jax.random.randint(k_s, (B,), 1, levels + 1)
    source = x0_override if x0_override is not None else x0
    lvl_keys = jax.random.split(k_lvls, levels + 1)
    corr = dict(
        corrupt_mode=corruption.get("corrupt_mode", "none"),
        corrupt_sigma_max=corruption.get("corrupt_sigma_max", 0.0),
        corrupt_sigma_min=corruption.get("corrupt_sigma_min", 0.0),
        corrupt_sigma_pow=corruption.get("corrupt_sigma_pow", 1.0),
        corrupt_anchor_frac=corruption.get("corrupt_anchor_frac", 0.0),
        corrupt_index_jitter_max=corruption.get("corrupt_index_jitter_max", 0),
        corrupt_index_jitter_prob=corruption.get("corrupt_index_jitter_prob", 0.0),
        corrupt_index_jitter_pow=corruption.get("corrupt_index_jitter_pow", 1.0),
        clamp_endpoints=corruption.get("clamp_endpoints", True),
        pos_clip=corruption.get("pos_clip", False),
        pos_clip_min=corruption.get("pos_clip_min", 0.0),
        pos_clip_max=corruption.get("pos_clip_max", 1.0),
        corrupt_vel=corruption.get("corrupt_vel", False),
    )
    x_all = jnp.stack(
        [
            _level_interp(lvl_keys[s], source, idx_levels[s], T, K_min, recompute_velocity, **corr)
            for s in range(levels + 1)
        ],
        axis=0,
    )  # [levels+1, B, T, D]
    b = jnp.arange(B)
    x_s = x_all[s_idx, b]
    if clean_target and corr["corrupt_mode"] != "none":
        clean = dict(corr, corrupt_mode="none")
        x_clean = jnp.stack(
            [
                _level_interp(lvl_keys[s], source, idx_levels[s], T, K_min,
                              recompute_velocity, **clean)
                for s in range(levels)
            ],
            axis=0,
        )  # [levels, B, T, D] — only levels 0..levels−1 ever serve as target
        x_prev = x_clean[s_idx - 1, b]
    else:
        x_prev = x_all[s_idx - 1, b]
    mask_s = jnp.take_along_axis(masks_levels, s_idx[:, None, None], axis=1)[:, 0]
    mask_prev = jnp.take_along_axis(masks_levels, (s_idx - 1)[:, None, None], axis=1)[:, 0]
    return x_s, x_prev, mask_s, mask_prev, s_idx, masks_levels, idx_levels
