"""Image-space ops: bilinear grid sampling, flow warping, pooling, resize.

Replaces the reference's torch native ops (F.grid_sample with
align_corners=True + border padding, latent_flow_interpolator.py:67-69;
F.avg_pool2d; F.interpolate bilinear) with gather-based JAX implementations —
XLA fuses the gathers/lerps; no custom kernel needed at these sizes.

Layout: NCHW at the API boundary (matching the reference's latent layout).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def grid_sample_bilinear(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with align_corners=True and border padding.

    x: [B, C, H, W]; grid: [B, H', W', 2] in [-1, 1] (x, y order).
    """
    B, C, H, W = x.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0)[:, None]  # [B,1,H',W']
    wy = (gy - y0)[:, None]

    def gather(yi, xi):
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = x.reshape(B, C, H * W)
        lin = (yi * W + xi).reshape(B, 1, -1)
        out = jnp.take_along_axis(flat, jnp.broadcast_to(lin, (B, C, lin.shape[-1])), axis=2)
        return out.reshape(B, C, *yi.shape[1:])

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def flow_to_grid(flow: jnp.ndarray) -> jnp.ndarray:
    """Pixel flow [B,2,H,W] -> normalized sampling grid [B,H,W,2]."""
    B, _, H, W = flow.shape
    y, x = jnp.meshgrid(jnp.arange(H, dtype=flow.dtype), jnp.arange(W, dtype=flow.dtype),
                        indexing="ij")
    base = jnp.stack([x, y], axis=-1)[None]
    grid = base + jnp.transpose(flow, (0, 2, 3, 1))
    gx = 2.0 * grid[..., 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * grid[..., 1] / max(H - 1, 1) - 1.0
    return jnp.stack([gx, gy], axis=-1)


def warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward warp x [B,C,H,W] by pixel flow [B,2,H,W]."""
    return grid_sample_bilinear(x, flow_to_grid(flow))


def avg_pool2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Non-overlapping average pool, NCHW."""
    B, C, H, W = x.shape
    return x.reshape(B, C, H // k, k, W // k, k).mean(axis=(3, 5))


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize NCHW, align_corners=False (jax.image semantics)."""
    B, C, _, _ = x.shape
    return jax.image.resize(x, (B, C, *out_hw), method="bilinear")


def l2_normalize(x: jnp.ndarray, axis: int = 1, eps: float = 1e-6) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def cost_volume(
    z0: jnp.ndarray,
    z1: jnp.ndarray,
    radius: int = 2,
    downscale: int = 2,
    normalize: bool = True,
) -> jnp.ndarray:
    """Local correlation volume [(2r+1)², H, W] (reference :72-110)."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    if downscale > 1:
        z0s = avg_pool2d(z0, downscale)
        z1s = avg_pool2d(z1, downscale)
    else:
        z0s, z1s = z0, z1
    if normalize:
        z0s = l2_normalize(z0s)
        z1s = l2_normalize(z1s)
    B, C, H, W = z0s.shape
    pad = radius
    z1p = jnp.pad(z1s, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    vols = []
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            shift = z1p[:, :, dy + pad: dy + pad + H, dx + pad: dx + pad + W]
            vols.append((z0s * shift).sum(axis=1, keepdims=True))
    cv = jnp.concatenate(vols, axis=1) / math.sqrt(max(1.0, float(C)))
    if downscale > 1:
        cv = resize_bilinear(cv, z0.shape[-2:])
    return cv
