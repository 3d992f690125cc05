"""Rectified flow: straight-path velocity matching (training + sampler).

The reference holds only a placeholder (src/diffusion/rectified_flow.py:1-3);
this is a working implementation offered as an alternative Stage-1 objective:
  x_t = (1 − t)·x0 + t·ε,  target velocity v = ε − x0,
  loss = ‖v_θ(x_t, t) − v‖²,
  sampling = Euler (or midpoint) integration from ε at t=1 down to t=0
as one lax.scan. Works with the same KeypointDenoiser (its eps head doubles
as the velocity head; the continuous t ∈ [0,1] is scaled onto the integer
timestep embedding).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def rf_interpolate(
    x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear path point and its target velocity; t ∈ [0,1], shape [B]."""
    tt = t.reshape(t.shape + (1,) * (x0.ndim - 1))
    x_t = (1.0 - tt) * x0 + tt * noise
    v = noise - x0
    return x_t, v


def rf_loss(
    v_pred: jnp.ndarray, x0: jnp.ndarray, noise: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Velocity-matching MSE. mask may be per-position ([B,T] / [B,T,1]) or
    full-shape; masked and unmasked paths have the same scale (mean over the
    selected elements)."""
    v = noise - x0
    se = (v_pred - v) ** 2
    if mask is not None:
        mask = mask.astype(se.dtype)
        while mask.ndim < se.ndim:
            mask = mask[..., None]
        mask = jnp.broadcast_to(mask, se.shape)
        return (se * mask).sum() / (mask.sum() + 1e-8)
    return se.mean()


def rf_sample(
    velocity_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    shape: Tuple[int, ...],
    steps: int = 20,
    method: str = "euler",           # euler | midpoint
    keep_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Integrate dx/dt = v_θ(x, t) from t=1 (noise) to t=0 in one scan."""
    x = jax.random.normal(key, shape, dtype=jnp.float32)
    if keep_mask is not None:
        x = x * (~keep_mask)[..., None]
    return _integrate(velocity_fn, x, steps, method, keep_mask, shape[0])


def rf_integrate(
    velocity_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    steps: int,
    method: str = "euler",
    post: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Integrate dx/dt = v_θ(x, t) from the given state at t=1 down to t=0.

    `post` runs after every committed step (known-value clamping / pos
    clipping — the rf counterpart of ddim_scan's post), so conditioned
    sampling keeps the same invariant as the diffusion samplers."""
    B = x.shape[0]
    ts = jnp.linspace(1.0, 0.0, steps + 1)
    post = post or (lambda z: z)

    def body(x, i):
        t_now = ts[i]
        dt = ts[i + 1] - ts[i]              # negative
        v = velocity_fn(x, jnp.full((B,), t_now))
        if method == "midpoint":
            x_mid = post(x + 0.5 * dt * v)
            v = velocity_fn(x_mid, jnp.full((B,), t_now + 0.5 * dt))
        x = post(x + dt * v)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(steps))
    return x


def _integrate(velocity_fn, x, steps, method, keep_mask, B):
    post = None
    if keep_mask is not None:
        post = lambda z: z * (~keep_mask)[..., None]
    return rf_integrate(velocity_fn, x, steps, method, post)


def reflow_pair(
    velocity_fn: Callable, key: jax.Array, shape: Tuple[int, ...], steps: int = 20
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(noise, generated) coupling for ReFlow distillation rounds."""
    noise = jax.random.normal(key, shape, dtype=jnp.float32)
    x = _integrate(velocity_fn, noise, steps, "euler", None, shape[0])
    return noise, x
