"""Keyframe mask sampling, nested-mask construction, and segment-lerp.

Capability parity with reference src/corruptions/keyframes.py: fixed-K mask
sampling (random / uniform-with-jitter), K-schedules (doubling/linear/geom),
nested mask builders (random, from base indices, from selector logits, from
per-level logits), and the vectorized segment linear interpolation
`interpolate_from_indices` (the hot op: searchsorted + gather).

TPU-native design notes:
  * All shapes are static: K per level comes from the deterministic K-schedule
    (a host-side Python computation), so `idx_levels` is a list of [B, K_s]
    arrays with static K_s — jit/scan friendly, no ragged structures.
  * Randomness is explicit `jax.random` key threading; random subsets are
    drawn with the argsort-of-uniforms trick (vectorized over batch).
  * Nested random masks use a single random priority per position: the mask
    at level s is the top-K_s positions by priority, which is distributionally
    identical to the reference's incremental random augmentation and makes
    nestedness structural rather than procedural.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# K schedules (host-side, static)
# ---------------------------------------------------------------------------

def compute_k_schedule(
    T: int,
    K_min: int,
    levels: int,
    schedule: str = "doubling",
    geom_gamma: Optional[float] = None,
) -> List[int]:
    """Anchor counts per level, K_list[s] for s = 0 (finest) .. levels (coarsest).

    Mirrors reference _compute_k_schedule (keyframes.py:135): doubling, linear
    and geometric growth from K_min at the coarsest level toward T.
    """
    K_min = min(K_min, T)
    K_list = [0 for _ in range(levels + 1)]
    K_list[levels] = K_min
    if levels <= 0:
        return K_list
    if schedule == "doubling":
        for s in range(levels, 0, -1):
            K_list[s - 1] = min(T, max(K_list[s] + 1, 2 * K_list[s]))
        return K_list
    if schedule == "linear":
        for s in range(levels - 1, -1, -1):
            frac = float(levels - s) / float(levels)
            target = int(round(K_min + frac * (T - K_min)))
            K_list[s] = min(T, max(K_list[s + 1] + 1, target))
        return K_list
    if schedule == "geom":
        if geom_gamma is None:
            geom_gamma = (float(T) / float(K_min)) ** (1.0 / float(levels)) if K_min > 0 else 1.0
        for s in range(levels - 1, -1, -1):
            target = int(round(K_min * (geom_gamma ** float(levels - s))))
            K_list[s] = min(T, max(K_list[s + 1] + 1, target))
        return K_list
    raise ValueError(f"Unknown k schedule: {schedule}")


# ---------------------------------------------------------------------------
# Fixed-K index sampling
# ---------------------------------------------------------------------------

def _mask_from_idx(idx: jnp.ndarray, T: int) -> jnp.ndarray:
    """[B, K] int indices -> [B, T] bool mask."""
    B = idx.shape[0]
    onehot = jax.nn.one_hot(idx, T, dtype=jnp.bool_)  # [B, K, T]
    return onehot.any(axis=1)


def sample_fixed_k_indices_batch(
    key: jax.Array,
    B: int,
    T: int,
    K: int,
    ensure_endpoints: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample K sorted anchor indices per sample (endpoints forced by default).

    Returns (idx [B, K] int32, mask [B, T] bool). Matches reference
    sample_fixed_k_indices_batch (keyframes.py:42) semantics.
    """
    if T <= 0 or K <= 0:
        raise ValueError("T and K must be positive")
    if ensure_endpoints and (T < 2 or K < 2):
        raise ValueError("T and K must be >= 2 when ensure_endpoints is True")
    K = min(K, T)
    if ensure_endpoints and T > 2 and K > 2:
        scores = jax.random.uniform(key, (B, T - 2))
        perm = jnp.argsort(scores, axis=1)
        chosen = perm[:, : K - 2] + 1
        idx = jnp.concatenate(
            [
                jnp.zeros((B, 1), dtype=jnp.int32),
                chosen.astype(jnp.int32),
                jnp.full((B, 1), T - 1, dtype=jnp.int32),
            ],
            axis=1,
        )
    elif ensure_endpoints:
        idx = jnp.concatenate(
            [jnp.zeros((B, 1), dtype=jnp.int32), jnp.full((B, 1), T - 1, dtype=jnp.int32)],
            axis=1,
        )
    else:
        scores = jax.random.uniform(key, (B, T))
        perm = jnp.argsort(scores, axis=1)
        idx = perm[:, :K].astype(jnp.int32)
    idx = jnp.sort(idx, axis=1)
    return idx, _mask_from_idx(idx, T)


def sample_fixed_k_indices_uniform_batch(
    key: jax.Array,
    B: int,
    T: int,
    K: int,
    ensure_endpoints: bool = True,
    jitter: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniformly-spaced anchors with optional jitter; strictly increasing.

    Matches reference sample_fixed_k_indices_uniform_batch (keyframes.py:84)
    including the forward/backward monotonic repair sweeps (static K, so the
    sweeps unroll at trace time).
    """
    if T <= 0 or K <= 0:
        raise ValueError("T and K must be positive")
    if ensure_endpoints and (T < 2 or K < 2):
        raise ValueError("T and K must be >= 2 when ensure_endpoints is True")
    K = min(K, T)
    base = jnp.linspace(0.0, T - 1, K)
    if jitter and K > 2 and T > 2:
        spacing = float(T - 1) / float(K - 1)
        max_jitter = spacing * float(jitter) * 0.5
        noise = (jax.random.uniform(key, (B, K)) - 0.5) * 2.0 * max_jitter
        noise = noise.at[:, 0].set(0.0).at[:, -1].set(0.0)
        pos = base[None, :] + noise
    else:
        pos = jnp.broadcast_to(base[None, :], (B, K))
    idx = jnp.clip(jnp.round(pos).astype(jnp.int32), 0, T - 1)
    if ensure_endpoints and K >= 2:
        idx = idx.at[:, 0].set(0).at[:, -1].set(T - 1)
    cols = [idx[:, k] for k in range(K)]
    for k in range(1, K):
        cols[k] = jnp.maximum(cols[k], cols[k - 1] + 1)
    # anchor the top end BEFORE the backward sweep: with large jitter the
    # forward sweep can push past T-1, and a post-hoc clip would create
    # duplicate anchors (violating the strictly-increasing contract)
    cols[K - 1] = jnp.minimum(cols[K - 1], T - 1)
    for k in range(K - 2, -1, -1):
        cols[k] = jnp.minimum(cols[k], cols[k + 1] - 1)
    idx = jnp.clip(jnp.stack(cols, axis=1), 0, T - 1)
    if ensure_endpoints and K >= 2:
        idx = idx.at[:, 0].set(0).at[:, -1].set(T - 1)
    return idx, _mask_from_idx(idx, T)


# ---------------------------------------------------------------------------
# Nested mask builders
# ---------------------------------------------------------------------------

def _nested_from_order(
    order: jnp.ndarray, T: int, K_list: Sequence[int]
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Build nested masks/idx from a per-sample priority order [B, T].

    order[:, :K_s] are the level-s anchors. Nestedness is structural: prefixes
    of a fixed order are nested by construction.
    """
    B = order.shape[0]
    levels = len(K_list) - 1
    masks = []
    idx_levels: List[jnp.ndarray] = []
    for s in range(levels + 1):
        K_s = max(int(K_list[s]), 2)
        idx_s = jnp.sort(order[:, :K_s].astype(jnp.int32), axis=1)
        idx_levels.append(idx_s)
        masks.append(_mask_from_idx(idx_s, T))
    masks_levels = jnp.stack(masks, axis=1)  # [B, levels+1, T]
    return masks_levels, idx_levels


def build_nested_masks_batch(
    key: jax.Array,
    B: int,
    T: int,
    K_min: int,
    levels: int,
    k_schedule: str = "doubling",
    k_geom_gamma: Optional[float] = None,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Random nested masks M_S ⊂ ... ⊂ M_0, endpoints always included.

    Returns (masks_levels [B, levels+1, T] bool, idx_levels list of [B, K_s]).
    Matches reference build_nested_masks_batch (keyframes.py:172).
    """
    if levels < 1:
        raise ValueError("levels must be >= 1")
    if T < 2:
        raise ValueError("T must be >= 2 when using endpoints")
    K_list = compute_k_schedule(T, K_min, levels, schedule=k_schedule, geom_gamma=k_geom_gamma)
    scores = jax.random.uniform(key, (B, T - 2))
    perm = (jnp.argsort(scores, axis=1) + 1).astype(jnp.int32)  # interior order
    endpoints = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=jnp.int32), jnp.full((B, 1), T - 1, dtype=jnp.int32)],
        axis=1,
    )
    order = jnp.concatenate([endpoints, perm], axis=1)  # [B, T]
    return _nested_from_order(order, T, K_list)


def build_nested_masks_from_base(
    key: jax.Array,
    idx_base: jnp.ndarray,
    T: int,
    levels: int,
    k_schedule: str = "doubling",
    k_geom_gamma: Optional[float] = None,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Nested masks whose coarsest level is fixed to idx_base [B, K_base].

    Finer levels add uniformly-random new anchors. Equivalent in distribution
    to reference build_nested_masks_from_base (keyframes.py:212): base anchors
    get +inf priority; the remaining positions are ranked by iid uniforms.
    """
    if levels < 1:
        raise ValueError("levels must be >= 1")
    if idx_base.ndim != 2:
        raise ValueError("idx_base must be [B, K]")
    B, K_base = idx_base.shape
    K_list = compute_k_schedule(T, K_base, levels, schedule=k_schedule, geom_gamma=k_geom_gamma)
    base_mask = _mask_from_idx(idx_base, T)  # [B, T]
    rand = jax.random.uniform(key, (B, T))
    # Base anchors first (priority 2 + deterministic tiebreak by base order so
    # order[:, :K_base] == sorted base idx), then random order over the rest.
    pri = jnp.where(base_mask, 2.0, rand)
    order = jnp.argsort(-pri, axis=1).astype(jnp.int32)
    return _nested_from_order(order, T, K_list)


def build_nested_masks_from_logits(
    logits: jnp.ndarray,
    K_min: int,
    levels: int,
    k_schedule: str = "doubling",
    k_geom_gamma: Optional[float] = None,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Nested masks ranked by selector logits [B, T]; endpoints always first.

    Matches reference build_nested_masks_from_logits (keyframes.py:260).
    """
    if logits.ndim != 2:
        raise ValueError("logits must be [B, T]")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    B, T = logits.shape
    if T < 2:
        raise ValueError("T must be >= 2 when using endpoints")
    K_list = compute_k_schedule(T, K_min, levels, schedule=k_schedule, geom_gamma=k_geom_gamma)
    if K_list[levels] < 2:
        raise ValueError("K_min must be >= 2 to include endpoints")
    interior = logits[:, 1:-1]
    order_interior = (jnp.argsort(-interior, axis=1) + 1).astype(jnp.int32)
    endpoints = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=jnp.int32), jnp.full((B, 1), T - 1, dtype=jnp.int32)],
        axis=1,
    )
    order = jnp.concatenate([endpoints, order_interior], axis=1)
    return _nested_from_order(order, T, K_list)


def build_nested_masks_from_level_logits(
    logits_levels: jnp.ndarray,
    K_min: int,
    levels: int,
    k_schedule: str = "doubling",
    k_geom_gamma: Optional[float] = None,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Nested masks from per-level logits [B, levels+1, T].

    Walking coarse→fine, each level adds its top-(K_s − already-selected)
    positions among the not-yet-selected. Matches reference
    build_nested_masks_from_level_logits (keyframes.py:297); fully vectorized
    because the per-level add count is deterministic under the fixed schedule.
    """
    if logits_levels.ndim != 3:
        raise ValueError("logits_levels must be [B, L, T]")
    B, L, T = logits_levels.shape
    if levels < 1:
        raise ValueError("levels must be >= 1")
    if L != levels + 1:
        raise ValueError(f"logits_levels second dim must be levels+1 ({levels + 1}), got {L}")
    if T < 2:
        raise ValueError("T must be >= 2 when using endpoints")
    K_list = compute_k_schedule(T, K_min, levels, schedule=k_schedule, geom_gamma=k_geom_gamma)

    selected = jnp.zeros((B, T), dtype=jnp.bool_)
    selected = selected.at[:, 0].set(True).at[:, -1].set(True)
    count = 2
    masks = [None] * (levels + 1)
    for s in range(levels, -1, -1):
        K_s = K_list[s]
        need = K_s - count
        if need < 0:
            raise ValueError("K_schedule produced decreasing K values; ensure nestedness.")
        if need > 0:
            scores = jnp.where(selected, -1e9, logits_levels[:, s, :])
            _, top_idx = jax.lax.top_k(scores, need)
            selected = selected | _mask_from_idx(top_idx, T)
            count = K_s
        masks[s] = selected
    masks_levels = jnp.stack(masks, axis=1)

    idx_levels: List[jnp.ndarray] = []
    for s in range(levels + 1):
        K_s = K_list[s]
        # top_k over bool-as-float with index tiebreak: take the K_s selected
        # positions, sorted ascending.
        scores = masks_levels[:, s].astype(jnp.float32) * T - jnp.arange(T, dtype=jnp.float32)[None, :]
        _, idx_s = jax.lax.top_k(scores, K_s)
        idx_levels.append(jnp.sort(idx_s.astype(jnp.int32), axis=1))
    return masks_levels, idx_levels


# ---------------------------------------------------------------------------
# Segment linear interpolation (the hot op)
# ---------------------------------------------------------------------------

def interpolate_from_indices(
    idx: jnp.ndarray,
    vals: jnp.ndarray,
    T: int,
    recompute_velocity: bool = False,
) -> jnp.ndarray:
    """Piecewise-linear fill between sorted anchors (vectorized).

    idx: [B, K] sorted anchor positions; vals: [B, K, D] anchor values.
    Returns [B, T, D] with anchors preserved exactly. Matches reference
    interpolate_from_indices (keyframes.py:348): searchsorted(right)−1 segment
    lookup, gap-clamped lerp weights, exact anchor scatter, optional velocity
    recompute for D == 4 ([pos(2), vel(2)] layout).
    """
    if idx.ndim != 2:
        raise ValueError("idx must be [B, K]")
    if vals.ndim != 3:
        raise ValueError("vals must be [B, K, D]")
    B, K = idx.shape
    D = vals.shape[-1]
    t_grid = jnp.arange(T, dtype=idx.dtype)

    seg = jax.vmap(lambda a: jnp.searchsorted(a, t_grid, side="right"))(idx) - 1
    seg = jnp.clip(seg, 0, K - 2)  # [B, T]
    left_idx = jnp.take_along_axis(idx, seg, axis=1)
    right_idx = jnp.take_along_axis(idx, seg + 1, axis=1)
    left_val = jnp.take_along_axis(vals, seg[..., None], axis=1)
    right_val = jnp.take_along_axis(vals, (seg + 1)[..., None], axis=1)
    denom = jnp.maximum(right_idx - left_idx, 1).astype(vals.dtype)[..., None]
    w = (t_grid[None, :] - left_idx).astype(vals.dtype)[..., None] / denom
    y = left_val + w * (right_val - left_val)
    # Exact anchor scatter (lerp endpoints are already exact up to rounding;
    # the scatter makes anchor preservation bitwise).
    b_idx = jnp.arange(B)[:, None]
    y = y.at[b_idx, idx].set(vals)
    if recompute_velocity and D == 4:
        y = recompute_velocity_channels(y, T)
    return y


def recompute_velocity_channels(y: jnp.ndarray, T: int) -> jnp.ndarray:
    """Finite-difference velocity for [.., T, 4] = [pos(2), vel(2)] layouts."""
    pos = y[..., :2]
    dt = 1.0 / float(T)
    v = jnp.concatenate([(pos[..., 1:, :] - pos[..., :-1, :]) / dt,
                         jnp.zeros_like(pos[..., :1, :])], axis=-2)
    return jnp.concatenate([pos, v], axis=-1)


def interpolate_from_mask(
    x: jnp.ndarray, mask: jnp.ndarray, recompute_velocity: bool = False
) -> jnp.ndarray:
    """Mask-based interpolation ([T, D] or [B, T, D]).

    Keyframe values are read from x at masked positions. Positions outside the
    anchor hull keep their x values (matching the reference's per-segment
    overwrite, which never touches frames before the first / after the last
    anchor). Fixed-shape: non-anchors are routed to their neighbouring anchors
    via cummax/cummin index propagation instead of dynamic nonzero().
    """
    single = x.ndim == 2
    if single:
        x, mask = x[None], mask[None]
    B, T, D = x.shape
    if mask.ndim == 1:
        mask = jnp.broadcast_to(mask[None], (B, T))
    t = jnp.arange(T)
    # Nearest anchor at-or-before / at-or-after each position (−1 / T if none).
    left = jax.lax.cummax(jnp.where(mask, t[None, :], -1), axis=1)
    right = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(mask, t[None, :], T), axis=1), axis=1), axis=1
    )
    inside = (left >= 0) & (right <= T - 1)
    left_c = jnp.clip(left, 0, T - 1)
    right_c = jnp.clip(right, 0, T - 1)
    left_val = jnp.take_along_axis(x, left_c[..., None], axis=1)
    right_val = jnp.take_along_axis(x, right_c[..., None], axis=1)
    denom = jnp.maximum(right_c - left_c, 1).astype(x.dtype)[..., None]
    w = (t[None, :] - left_c).astype(x.dtype)[..., None] / denom
    y_in = left_val + w * (right_val - left_val)
    y = jnp.where(inside[..., None], y_in, x)
    y = jnp.where(mask[..., None], x, y)
    if recompute_velocity and D == 4:
        y = recompute_velocity_channels(y, T)
    return y[0] if single else y
