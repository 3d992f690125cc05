"""Learned latent interpolators (temporal-conv and lerp-residual families).

Parity with reference src/models/video_interpolator.py
(TinyTemporalInterpolator :8 — depthwise temporal conv refinement of the
lerped sequence) and src/models/latent_lerp_interpolator.py
(LatentLerpResidualInterpolator :11 — endpoint-locked residual
ẑ = lerp + α(1−α)·res with an uncertainty head).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class TinyTemporalInterpolator(nn.Module):
    """Per-channel (depthwise) temporal conv stack over [B,T,D]."""

    data_dim: int
    kernel_size: int = 3
    n_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.kernel_size % 2 == 0:
            raise ValueError("kernel_size must be odd for symmetric padding")
        x = z.astype(self.dtype)
        for i in range(self.n_layers):
            x = nn.Conv(
                features=self.data_dim,
                kernel_size=(self.kernel_size,),
                padding="SAME",
                feature_group_count=self.data_dim,
                dtype=self.dtype,
                name=f"dwconv_{i}",
            )(x)
            x = nn.silu(x)
        return x.astype(z.dtype)


class LatentLerpResidualInterpolator(nn.Module):
    """Endpoint-locked residual on top of LERP.

    Given endpoint latents (z_a, z_b) and blend weights α∈[0,1]:
      ẑ(α) = lerp(z_a, z_b, α) + α(1−α)·res([z_a, z_b, lerp, α])
    plus a per-position uncertainty head (σ in log space). The α(1−α) gate
    makes the endpoints exact by construction.
    """

    data_dim: int
    hidden_dim: int = 256
    n_layers: int = 3
    with_uncertainty: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, z_a: jnp.ndarray, z_b: jnp.ndarray, alpha: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """z_a/z_b: [..., D]; alpha: broadcastable [..., 1] or [...]."""
        if alpha.ndim < z_a.ndim:
            alpha = alpha[..., None]
        alpha = alpha.astype(self.dtype)
        lerp = (1.0 - alpha) * z_a + alpha * z_b
        h = jnp.concatenate(
            [z_a.astype(self.dtype), z_b.astype(self.dtype), lerp, alpha], axis=-1
        )
        for i in range(self.n_layers - 1):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"fc_{i}")(h)
            h = nn.silu(h)
        res = nn.Dense(
            self.data_dim, kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="res_out",
        )(h)
        z_hat = lerp + alpha * (1.0 - alpha) * res
        if self.with_uncertainty:
            log_sigma = nn.Dense(1, dtype=self.dtype, name="unc_out")(h)
        else:
            log_sigma = jnp.zeros_like(z_hat[..., :1])
        return z_hat.astype(z_a.dtype), log_sigma.astype(jnp.float32)
