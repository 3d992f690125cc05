"""Per-frame geometric features from an anchor mask.

Parity with reference src/utils/frame_features.py (frame_features_from_mask
:6): [t_norm?, is_anchor, alpha, gap_norm, dist_mid] per frame, with
cummax/cummin neighbour-anchor propagation and endpoint fallbacks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_features_from_mask(mask: jnp.ndarray, include_time: bool = True) -> jnp.ndarray:
    if mask.ndim != 2:
        raise ValueError("mask must be [B,T]")
    mask = mask.astype(bool)
    B, T = mask.shape
    if T <= 1:
        return jnp.zeros((B, T, 5 if include_time else 4), dtype=jnp.float32)

    # samples without any anchor default to endpoint anchors
    has_any = mask.any(axis=1, keepdims=True)
    fallback = jnp.zeros((B, T), dtype=bool).at[:, 0].set(True).at[:, -1].set(True)
    mask = jnp.where(has_any, mask, fallback)

    t = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32)[None, :], (B, T))
    first = jnp.argmax(mask, axis=1).astype(jnp.float32)[:, None]
    last = (T - 1 - jnp.argmax(mask[:, ::-1], axis=1)).astype(jnp.float32)[:, None]

    left = jax.lax.cummax(jnp.where(mask, t, -1e9), axis=1)
    right = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(mask, t, 1e9), axis=1), axis=1), axis=1)
    left = jnp.where(left < 0.0, first, left)
    right = jnp.where(right > float(T - 1), last, right)

    gap = jnp.maximum(right - left, 1.0)
    alpha = jnp.clip((t - left) / gap, 0.0, 1.0)
    dist = jnp.minimum(jnp.maximum(t - left, 0.0), jnp.maximum(right - t, 0.0))
    dist_mid = jnp.clip(2.0 * dist / gap, 0.0, 1.0)
    gap_norm = gap / float(max(1, T - 1))
    is_anchor = mask.astype(jnp.float32)

    feats = [is_anchor, alpha, gap_norm, dist_mid]
    if include_time:
        feats = [t / float(max(1, T - 1))] + feats
    return jnp.stack(feats, axis=-1)
