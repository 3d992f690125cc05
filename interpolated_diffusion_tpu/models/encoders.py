"""Condition encoders. Parity with reference src/models/encoders.py.

MazeEncoder: Conv3x3+SiLU stack → global mean pool → linear (:8).
StartGoalEncoder: 4→d_cond MLP (:28).
MazeConditionEncoder: occ(+sdf) CNN + optional start/goal sum (:41).
TextConditionEncoder: seq-pooled text-embedding MLP (:74).

Convs run NHWC (TPU-native layout); cond dicts carry occ as [B, C, G, G]
(reference layout) and are transposed once on entry.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class MazeEncoder(nn.Module):
    d_cond: int = 128
    channels: Tuple[int, ...] = (32, 64)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, C, G, G] (reference layout) -> NHWC for TPU convs.
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        for i, c in enumerate(self.channels):
            x = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.silu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.d_cond, dtype=self.dtype, name="fc")(x)


class StartGoalEncoder(nn.Module):
    d_cond: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, start_goal: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.d_cond, dtype=self.dtype, name="fc1")(start_goal.astype(self.dtype))
        h = nn.silu(h)
        return nn.Dense(self.d_cond, dtype=self.dtype, name="fc2")(h)


class MazeConditionEncoder(nn.Module):
    use_sdf: bool = False
    d_cond: int = 128
    use_start_goal: bool = True
    maze_channels: Tuple[int, ...] = (32, 64)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        occ = cond["occ"]
        if self.use_sdf:
            sdf = cond.get("sdf")
            if sdf is None:
                raise ValueError("use_sdf is True but sdf missing from cond")
            x = jnp.concatenate([occ, sdf], axis=1)
        else:
            x = occ
        emb = MazeEncoder(self.d_cond, self.maze_channels, dtype=self.dtype, name="maze")(x)
        if self.use_start_goal:
            if "start_goal" not in cond:
                raise ValueError("use_start_goal is True but start_goal missing from cond")
            emb = emb + StartGoalEncoder(self.d_cond, dtype=self.dtype, name="sg")(
                cond["start_goal"]
            )
        return emb


class TextConditionEncoder(nn.Module):
    d_cond: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        text = cond.get("text_embed")
        if text is None:
            raise ValueError("text_embed missing from cond")
        if text.ndim > 2:
            text = text.mean(axis=tuple(range(1, text.ndim - 1)))
        h = nn.Dense(self.d_cond, dtype=self.dtype, name="fc1")(text.astype(self.dtype))
        h = nn.silu(h)
        return nn.Dense(self.d_cond, dtype=self.dtype, name="fc2")(h)
