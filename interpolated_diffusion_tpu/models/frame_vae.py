"""Frame VAE: RGB frames ↔ latents with the SD 0.18215 scaling convention.

Parity with reference src/models/frame_vae.py (FrameAutoencoderKL :17 —
frozen SD AutoencoderKL with [B,T,3,H,W] handling). Two paths:

  * `TorchFrameVAE`: the reference behavior verbatim — a frozen pretrained
    AutoencoderKL via diffusers (torch-CPU here), used at CACHE-BUILD time
    (precomputing latents), never on the accelerator.
  * `FrameVAE` (flax): a from-scratch conv VAE with the SD latent layout
    (8× spatial downsample, 4 channels, 0.18215 scaling) for end-to-end
    TPU training when no pretrained weights are wanted. SD safetensors map
    onto a matching layout; the conversion tool is follow-up work.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SD_SCALE = 0.18215

Dtype = Any


class TorchFrameVAE:
    """Frozen diffusers AutoencoderKL wrapper (host-side prep only)."""

    def __init__(self, model_name: str = "stabilityai/sd-vae-ft-ema",
                 device: str = "cpu"):
        try:
            import torch
            from diffusers import AutoencoderKL  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise ImportError("TorchFrameVAE needs diffusers (host prep only)") from e
        self._torch = torch
        self.vae = AutoencoderKL.from_pretrained(model_name).to(device).eval()
        self.device = device

    def encode(self, frames: np.ndarray) -> np.ndarray:
        """[B,T,3,H,W] in [0,1] → latents [B,T,4,H/8,W/8] (scaled)."""
        torch = self._torch
        B, T = frames.shape[:2]
        x = torch.from_numpy(frames.reshape(B * T, *frames.shape[2:])).to(self.device)
        x = x * 2.0 - 1.0
        with torch.no_grad():
            z = self.vae.encode(x).latent_dist.sample() * SD_SCALE
        return z.cpu().numpy().reshape(B, T, *z.shape[1:])

    def decode(self, latents: np.ndarray) -> np.ndarray:
        torch = self._torch
        B, T = latents.shape[:2]
        z = torch.from_numpy(latents.reshape(B * T, *latents.shape[2:])).to(self.device)
        with torch.no_grad():
            x = self.vae.decode(z / SD_SCALE).sample
        x = ((x + 1.0) / 2.0).clamp(0, 1)
        return x.cpu().numpy().reshape(B, T, *x.shape[1:])


class _Down(nn.Module):
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.silu(x)
        return nn.silu(nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype)(x))


class _Up(nn.Module):
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
        x = nn.silu(nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype)(x))
        return nn.silu(nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype)(x))


class FrameVAE(nn.Module):
    """From-scratch conv VAE with the SD latent contract (8×↓, 4ch)."""

    latent_channels: int = 4
    base_ch: int = 32
    dtype: Dtype = jnp.float32

    def setup(self):
        self.enc_blocks = [_Down(self.base_ch * m, dtype=self.dtype)
                           for m in (1, 2, 4)]
        self.enc_out = nn.Conv(2 * self.latent_channels, (3, 3), padding="SAME",
                               dtype=self.dtype)
        self.dec_in = nn.Conv(self.base_ch * 4, (3, 3), padding="SAME",
                              dtype=self.dtype)
        self.dec_blocks = [_Up(self.base_ch * m, dtype=self.dtype)
                           for m in (4, 2, 1)]
        self.dec_out = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype)

    def encode(self, frames: jnp.ndarray, key=None) -> jnp.ndarray:
        """[B,T,3,H,W] in [0,1] → latents [B,T,4,H/8,W/8] (scaled)."""
        B, T = frames.shape[:2]
        x = frames.reshape(B * T, *frames.shape[2:])
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype) * 2.0 - 1.0
        for blk in self.enc_blocks:
            x = blk(x)
        moments = self.enc_out(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        z = mean
        if key is not None:
            z = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * \
                jax.random.normal(key, mean.shape, dtype=mean.dtype)
        z = jnp.transpose(z, (0, 3, 1, 2)) * SD_SCALE
        return z.reshape(B, T, *z.shape[1:]).astype(jnp.float32)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        B, T = latents.shape[:2]
        z = latents.reshape(B * T, *latents.shape[2:]) / SD_SCALE
        x = jnp.transpose(z, (0, 2, 3, 1)).astype(self.dtype)
        x = self.dec_in(x)
        for blk in self.dec_blocks:
            x = blk(x)
        x = jnp.tanh(self.dec_out(x)) * 0.5 + 0.5
        x = jnp.transpose(x, (0, 3, 1, 2))
        return x.reshape(B, T, *x.shape[1:]).astype(jnp.float32)

    def __call__(self, frames: jnp.ndarray, key=None):
        z = self.encode(frames, key)
        return self.decode(z), z
