"""Logit/sigmoid transforms on position dims. Parity: src/utils/normalize.py."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def logit_pos(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Logit-transform the first two (position) dims, other dims unchanged."""
    if x.shape[-1] < 2:
        return x
    pos = jnp.clip(x[..., :2], eps, 1.0 - eps)
    pos = jnp.log(pos / (1.0 - pos))
    return jnp.concatenate([pos, x[..., 2:]], axis=-1)


def sigmoid_pos(x: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid the first two (position) dims, other dims unchanged."""
    if x.shape[-1] < 2:
        return x
    pos = jax.nn.sigmoid(x[..., :2])
    return jnp.concatenate([pos, x[..., 2:]], axis=-1)
