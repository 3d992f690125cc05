"""Exponential moving average of a parameter pytree.

Parity with reference src/utils/ema.py (shadow params, update/copy_to,
state round-trip) — functional: ema state IS a params-shaped pytree, update
is one fused pytree lerp inside the jitted train step.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    # Real copies: aliasing params would break buffer donation in the jitted
    # train step (same buffer donated twice).
    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """shadow = decay * shadow + (1 - decay) * params."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )
