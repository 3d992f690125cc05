"""Interpolation corruption for video latents and token grids.

Capability parity with reference src/corruptions/video_keyframes.py:
smooth/learned interpolation modes over the base segment-lerp (:12, :23),
level & adjacent-level corruption batch builders for flat latents
(:116, :213) and token grids [B,T,N,D] (:332, :555) — student-anchor
replacement (noisy-teacher or precomputed Phase-1 anchors joined by index),
per-frame/per-token confidence maps, distance-scaled Gaussian noise with
anchor-noise attenuation.

TPU-native design: the reference's per-level boolean-select loops become
"compute every level, gather by sampled level" (static shapes; levels ≤ 8);
token grids reuse the flat path by folding spatial tokens into the feature
dim (interpolation is linear per feature). Randomness is explicit key
threading.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .keyframes import build_nested_masks_batch, interpolate_from_indices

InterpFn = Callable[[jnp.ndarray], jnp.ndarray]  # [B,T,D] -> [B,T,D]


def smooth_latents(z: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise temporal conv over [B,T,D] with a symmetric 1D kernel."""
    B, T, D = z.shape
    x = jnp.transpose(z, (0, 2, 1)).reshape(B * D, 1, T)
    k = kernel.reshape(1, 1, -1).astype(z.dtype)
    pad = kernel.shape[-1] // 2
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return jnp.transpose(y.reshape(B, D, T), (0, 2, 1))


def _scatter_anchor_vals(z: jnp.ndarray, idx: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    b = jnp.arange(z.shape[0])[:, None]
    return z.at[b, idx].set(vals)


def interpolate_video_from_indices(
    idx: jnp.ndarray,
    vals: jnp.ndarray,
    T: int,
    mode: str = "linear",
    smooth_kernel: Optional[jnp.ndarray] = None,
    interp_fn: Optional[InterpFn] = None,
) -> jnp.ndarray:
    """Segment-lerp + optional smooth-kernel / learned-interp refinement.

    Anchors are re-scattered exactly after refinement (reference :23-50).
    """
    z = interpolate_from_indices(idx, vals, T, recompute_velocity=False)
    if mode == "smooth":
        if smooth_kernel is None:
            smooth_kernel = jnp.array([0.25, 0.5, 0.25], dtype=z.dtype)
        z = smooth_latents(z, smooth_kernel)
        return _scatter_anchor_vals(z, idx, vals)
    if mode == "learned":
        if interp_fn is None:
            raise ValueError("interp_fn is required for mode='learned'")
        z = interp_fn(z)
        return _scatter_anchor_vals(z, idx, vals)
    return z


def distance_alpha(idx: jnp.ndarray, T: int) -> jnp.ndarray:
    """[B,T,1] noise scale: 0 at anchors, 1 at segment midpoints."""
    B, K = idx.shape
    t_grid = jnp.arange(T, dtype=idx.dtype)
    seg = jax.vmap(lambda a: jnp.searchsorted(a, t_grid, side="right"))(idx) - 1
    seg = jnp.clip(seg, 0, K - 2)
    left = jnp.take_along_axis(idx, seg, axis=1)
    right = jnp.take_along_axis(idx, seg + 1, axis=1)
    gap = jnp.maximum(right - left, 1)
    dist = jnp.minimum(t_grid[None, :] - left, right - t_grid[None, :])
    return jnp.clip(2.0 * dist.astype(jnp.float32) / gap.astype(jnp.float32), 0, 1)[..., None]


def _gather_anchor_values(
    anchor_values: jnp.ndarray,     # [B,T,D'] full grid OR [B,Ka,D'] at anchor_idx
    anchor_idx: Optional[jnp.ndarray],
    idx: jnp.ndarray,               # [B,K]
    T: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (vals [B,K,D'], valid [B,K]) — precomputed student anchors
    matched to this level's indices (reference :415-460 lookup join)."""
    B, K = idx.shape
    if anchor_values.shape[1] == T and anchor_idx is None:
        vals = jnp.take_along_axis(anchor_values, idx[..., None], axis=1)
        return vals, jnp.ones((B, K), dtype=bool)
    if anchor_idx is None:
        raise ValueError("anchor_idx required when anchor_values is [B,Ka,D']")
    Ka = anchor_idx.shape[1]
    lookup = jnp.full((B, T), -1, dtype=jnp.int32)
    b = jnp.arange(B)[:, None]
    lookup = lookup.at[b, anchor_idx].set(
        jnp.broadcast_to(jnp.arange(Ka, dtype=jnp.int32)[None, :], (B, Ka))
    )
    pos = jnp.take_along_axis(lookup, idx, axis=1)
    valid = pos >= 0
    vals = jnp.take_along_axis(anchor_values, jnp.maximum(pos, 0)[..., None], axis=1)
    return vals, valid


def _level_video_interp(
    key: jax.Array,
    z0: jnp.ndarray,          # [B,T,D]
    idx: jnp.ndarray,         # [B,K_s]
    mask_s: jnp.ndarray,      # [B,T]
    T: int,
    *,
    corrupt_mode: str,
    corrupt_sigma: float,
    anchor_noise_frac: float,
    student_replace_prob: float,
    student_noise_std: float,
    anchor_values: Optional[jnp.ndarray],
    anchor_idx: Optional[jnp.ndarray],
    conf_anchor: float,
    conf_student: float,
    conf_endpoints: float,
    conf_missing: float,
    clamp_endpoints: bool,
    interp_mode: str,
    smooth_kernel: Optional[jnp.ndarray],
    interp_fn: Optional[InterpFn],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One level's corrupted interpolation + per-frame confidence."""
    B, _, D = z0.shape
    K = idx.shape[1]
    k_rep, k_noise_a, k_noise = jax.random.split(key, 3)
    vals = jnp.take_along_axis(z0, idx[..., None], axis=1)

    replace_mask = jnp.zeros((B, K), dtype=bool)
    if student_replace_prob > 0.0:
        replace_mask = jax.random.uniform(k_rep, (B, K)) < float(student_replace_prob)
        if clamp_endpoints:
            replace_mask = replace_mask & (idx != 0) & (idx != T - 1)
        if anchor_values is not None:
            student_vals, valid = _gather_anchor_values(anchor_values, anchor_idx, idx, T)
            replace_mask = replace_mask & valid
            if student_noise_std > 0.0:
                student_vals = student_vals + jax.random.normal(
                    k_noise_a, student_vals.shape, dtype=student_vals.dtype
                ) * float(student_noise_std)
            vals = jnp.where(replace_mask[..., None], student_vals, vals)
        else:
            noise = jax.random.normal(k_noise_a, vals.shape, dtype=vals.dtype) * float(student_noise_std)
            vals = jnp.where(replace_mask[..., None], vals + noise, vals)

    zs = interpolate_video_from_indices(
        idx, vals, T, mode=interp_mode, smooth_kernel=smooth_kernel, interp_fn=interp_fn
    )

    if corrupt_mode != "none" and corrupt_sigma > 0.0:
        noise = jax.random.normal(k_noise, zs.shape, dtype=zs.dtype) * float(corrupt_sigma)
        if corrupt_mode == "dist":
            noise = noise * distance_alpha(idx, T).astype(zs.dtype)
        if anchor_noise_frac < 1.0:
            scale = jnp.where(mask_s, float(anchor_noise_frac), 1.0).astype(zs.dtype)
            zs = zs + noise * scale[..., None]
        else:
            zs = zs + noise

    conf = jnp.full((B, T), float(conf_missing))
    conf_vals = jnp.where(replace_mask, float(conf_student), float(conf_anchor))
    b = jnp.arange(B)[:, None]
    conf = conf.at[b, idx].set(conf_vals)
    if clamp_endpoints:
        conf = conf.at[:, 0].set(float(conf_endpoints)).at[:, -1].set(float(conf_endpoints))
    return zs, conf


_DEFAULTS = dict(
    corrupt_mode="gauss", corrupt_sigma=0.02, anchor_noise_frac=0.25,
    student_replace_prob=0.5, student_noise_std=0.02,
    anchor_values=None, anchor_idx=None,
    conf_anchor=0.95, conf_student=0.5, conf_endpoints=1.0, conf_missing=0.0,
    clamp_endpoints=True, interp_mode="linear", smooth_kernel=None, interp_fn=None,
)


def build_video_interp_level_batch(
    key: jax.Array,
    z0_flat: jnp.ndarray,
    K_min: int,
    levels: int,
    masks_levels: Optional[jnp.ndarray] = None,
    idx_levels: Optional[List[jnp.ndarray]] = None,
    s_idx: Optional[jnp.ndarray] = None,
    **kwargs,
):
    """x0-mode corruption batch for flat video latents [B,T,D].

    Returns (z_interp, mask_s, s_idx, masks_levels, idx_levels, conf_s).
    """
    opts = {**_DEFAULTS, **kwargs}
    B, T, D = z0_flat.shape
    k_masks, k_s, k_lvls = jax.random.split(key, 3)
    if masks_levels is None or idx_levels is None:
        masks_levels, idx_levels = build_nested_masks_batch(k_masks, B, T, K_min, levels)
    if s_idx is None:
        s_idx = jax.random.randint(k_s, (B,), 1, levels + 1)
    lvl_keys = jax.random.split(k_lvls, levels + 1)
    zs_all, conf_all = [], []
    for s in range(1, levels + 1):
        zs, conf = _level_video_interp(
            lvl_keys[s], z0_flat, idx_levels[s], masks_levels[:, s], T, **opts
        )
        zs_all.append(zs)
        conf_all.append(conf)
    zs_all = jnp.stack(zs_all)     # [levels, B, T, D]
    conf_all = jnp.stack(conf_all)
    b = jnp.arange(B)
    z_interp = zs_all[s_idx - 1, b]
    conf_s = conf_all[s_idx - 1, b]
    mask_s = jnp.take_along_axis(masks_levels, s_idx[:, None, None], axis=1)[:, 0]
    return z_interp, mask_s, s_idx, masks_levels, idx_levels, conf_s


def build_video_interp_adjacent_batch(
    key: jax.Array,
    z0_flat: jnp.ndarray,
    K_min: int,
    levels: int,
    masks_levels: Optional[jnp.ndarray] = None,
    idx_levels: Optional[List[jnp.ndarray]] = None,
    s_idx: Optional[jnp.ndarray] = None,
    **kwargs,
):
    """Adjacent-mode corruption batch: returns
    (z_s, z_prev, mask_s, mask_prev, s_idx, masks_levels, idx_levels,
    conf_s, conf_prev)."""
    opts = {**_DEFAULTS, **kwargs}
    B, T, D = z0_flat.shape
    k_masks, k_s, k_lvls = jax.random.split(key, 3)
    if masks_levels is None or idx_levels is None:
        masks_levels, idx_levels = build_nested_masks_batch(k_masks, B, T, K_min, levels)
    if s_idx is None:
        s_idx = jax.random.randint(k_s, (B,), 1, levels + 1)
    lvl_keys = jax.random.split(k_lvls, levels + 1)
    zs_all, conf_all = [], []
    for s in range(levels + 1):
        zs, conf = _level_video_interp(
            lvl_keys[s], z0_flat, idx_levels[s], masks_levels[:, s], T, **opts
        )
        zs_all.append(zs)
        conf_all.append(conf)
    zs_all = jnp.stack(zs_all)
    conf_all = jnp.stack(conf_all)
    b = jnp.arange(B)
    z_s = zs_all[s_idx, b]
    z_prev = zs_all[s_idx - 1, b]
    conf_s = conf_all[s_idx, b]
    conf_prev = conf_all[s_idx - 1, b]
    mask_s = jnp.take_along_axis(masks_levels, s_idx[:, None, None], axis=1)[:, 0]
    mask_prev = jnp.take_along_axis(masks_levels, (s_idx - 1)[:, None, None], axis=1)[:, 0]
    return z_s, z_prev, mask_s, mask_prev, s_idx, masks_levels, idx_levels, conf_s, conf_prev


def _tokens_to_flat(z: jnp.ndarray) -> jnp.ndarray:
    B, T, N, D = z.shape
    return z.reshape(B, T, N * D)


def _flat_to_tokens(z: jnp.ndarray, N: int, D: int) -> jnp.ndarray:
    B, T, _ = z.shape
    return z.reshape(B, T, N, D)


def build_video_token_interp_level_batch(
    key: jax.Array, z0_tokens: jnp.ndarray, K_min: int, levels: int, **kwargs
):
    """Token-grid x0-mode corruption ([B,T,N,D]); anchors are per-frame.

    Spatial tokens fold into the feature dim (interp is linear per feature),
    conf maps broadcast per frame to [B,T,N]. Returns the same tuple as the
    flat builder with token-shaped z and conf.
    """
    B, T, N, D = z0_tokens.shape
    av = kwargs.get("anchor_values")
    if av is not None and av.ndim == 4:
        kwargs = dict(kwargs)
        kwargs["anchor_values"] = av.reshape(av.shape[0], av.shape[1], -1)
    z_interp, mask_s, s_idx, masks_levels, idx_levels, conf_s = (
        build_video_interp_level_batch(key, _tokens_to_flat(z0_tokens), K_min, levels, **kwargs)
    )
    conf_tok = jnp.broadcast_to(conf_s[..., None], (B, T, N))
    mask_tok = jnp.broadcast_to(mask_s[..., None], (B, T, N))
    return (_flat_to_tokens(z_interp, N, D), mask_tok, s_idx, masks_levels,
            idx_levels, conf_tok)


def build_video_token_interp_adjacent_batch(
    key: jax.Array, z0_tokens: jnp.ndarray, K_min: int, levels: int, **kwargs
):
    B, T, N, D = z0_tokens.shape
    av = kwargs.get("anchor_values")
    if av is not None and av.ndim == 4:
        kwargs = dict(kwargs)
        kwargs["anchor_values"] = av.reshape(av.shape[0], av.shape[1], -1)
    (z_s, z_prev, mask_s, mask_prev, s_idx, masks_levels, idx_levels,
     conf_s, conf_prev) = build_video_interp_adjacent_batch(
        key, _tokens_to_flat(z0_tokens), K_min, levels, **kwargs
    )
    expand = lambda m: jnp.broadcast_to(m[..., None], (B, T, N))
    return (_flat_to_tokens(z_s, N, D), _flat_to_tokens(z_prev, N, D),
            expand(mask_s), expand(mask_prev), s_idx, masks_levels, idx_levels,
            expand(conf_s), expand(conf_prev))
