"""Diffusion beta schedules and alpha-bar tables.

Capability parity with reference src/diffusion/schedules.py (linear & cosine
beta schedules, cumulative alpha products). TPU-native design: the schedule is
an immutable NamedTuple of jnp arrays so it threads through jit/scan as a
pytree of static-shape tables.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp


class DiffusionSchedule(NamedTuple):
    """Precomputed per-timestep tables, each of shape [n_timesteps]."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alpha_bar: jnp.ndarray
    sqrt_alpha_bar: jnp.ndarray
    sqrt_one_minus_alpha_bar: jnp.ndarray

    @property
    def n_timesteps(self) -> int:
        return self.betas.shape[0]


def linear_beta_schedule(
    n_timesteps: int, beta_start: float = 1e-4, beta_end: float = 2e-2
) -> jnp.ndarray:
    return jnp.linspace(beta_start, beta_end, n_timesteps, dtype=jnp.float32)


def cosine_beta_schedule(n_timesteps: int, s: float = 0.008) -> jnp.ndarray:
    steps = n_timesteps + 1
    x = jnp.linspace(0.0, n_timesteps, steps, dtype=jnp.float32)
    alphas_cumprod = jnp.cos(((x / n_timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return jnp.clip(betas, 1e-8, 0.999)


def make_beta_schedule(name: str, n_timesteps: int) -> jnp.ndarray:
    if name == "linear":
        return linear_beta_schedule(n_timesteps)
    if name == "cosine":
        return cosine_beta_schedule(n_timesteps)
    raise ValueError(f"Unknown schedule {name}")


def make_alpha_bars(betas: jnp.ndarray) -> DiffusionSchedule:
    alphas = 1.0 - betas
    alpha_bar = jnp.cumprod(alphas, axis=0)
    return DiffusionSchedule(
        betas=betas,
        alphas=alphas,
        alpha_bar=alpha_bar,
        sqrt_alpha_bar=jnp.sqrt(alpha_bar),
        sqrt_one_minus_alpha_bar=jnp.sqrt(1.0 - alpha_bar),
    )


def make_schedule(name: str, n_timesteps: int) -> DiffusionSchedule:
    """Convenience: betas + alpha-bar tables in one call."""
    return make_alpha_bars(make_beta_schedule(name, n_timesteps))
