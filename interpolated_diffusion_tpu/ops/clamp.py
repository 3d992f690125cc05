"""Anchor clamping (hard and confidence-soft), functional.

Parity with reference src/utils/clamp.py (apply_clamp :4, apply_soft_clamp
:13) but pure: returns new arrays instead of mutating.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def apply_clamp(
    x_hat: jnp.ndarray,
    x_ref: jnp.ndarray,
    clamp_mask: Optional[jnp.ndarray],
    clamp_dims: str,
) -> jnp.ndarray:
    """Hard clamp: where clamp_mask [B, T], overwrite x_hat with x_ref.

    clamp_dims == "pos" limits the overwrite to the first two (position) dims.
    """
    if clamp_mask is None:
        return x_hat
    m = clamp_mask[..., None]
    if clamp_dims == "pos":
        pos = jnp.where(m, x_ref[..., :2], x_hat[..., :2])
        return jnp.concatenate([pos, x_hat[..., 2:]], axis=-1)
    return jnp.where(m, x_ref, x_hat)


def apply_soft_clamp(
    x_hat: jnp.ndarray,
    x_ref: jnp.ndarray,
    conf: Optional[jnp.ndarray],
    lam: float,
    clamp_dims: str,
) -> jnp.ndarray:
    """Soft clamp: x_hat += lam * conf * (x_ref - x_hat)."""
    if conf is None or lam <= 0.0:
        return x_hat
    w = conf[..., None] if conf.ndim == 2 else conf
    w = w * float(lam)
    if clamp_dims == "pos":
        pos = x_hat[..., :2] + w * (x_ref[..., :2] - x_hat[..., :2])
        return jnp.concatenate([pos, x_hat[..., 2:]], axis=-1)
    return x_hat + w * (x_ref - x_hat)
