"""Text-conditioned video keyframe selector.

Parity with reference src/models/video_selector.py (VideoKeyframeSelector
:25): learned time embedding + sinusoid positions, FiLM transformer over T
time tokens conditioned on pooled text embedding (+ optional level input),
per-frame logits out.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from .denoisers import continuous_time_embedding
from .encoders import TextConditionEncoder
from .transformer import TransformerEncoder

Dtype = Any


class VideoKeyframeSelector(nn.Module):
    T: int
    d_model: int = 256
    d_cond: int = 256
    n_layers: int = 6
    n_heads: int = 8
    d_ff: int = 1024
    pos_dim: int = 64
    use_level: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        cond_vec = TextConditionEncoder(d_cond=self.d_cond, dtype=self.dtype,
                                        name="text_enc")(cond)
        if self.use_level:
            level = cond.get("level")
            if level is None:
                raise ValueError("use_level=True but level missing from cond")
            if level.ndim == 1:
                level = level[:, None]
            h = nn.Dense(self.d_cond, dtype=self.dtype, name="lvl_fc1")(level.astype(self.dtype))
            h = nn.silu(h)
            cond_vec = cond_vec + nn.Dense(self.d_cond, dtype=self.dtype, name="lvl_fc2")(h)

        B = cond_vec.shape[0]
        t = jnp.linspace(0.0, 1.0, self.T)
        pos = continuous_time_embedding(t, self.pos_dim).astype(self.dtype)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="pos_proj")(pos)
        time_embed = self.param(
            "time_embed", nn.initializers.normal(0.02), (self.T, self.d_model)
        )
        x = jnp.broadcast_to(x[None], (B, self.T, self.d_model)) + time_embed[None].astype(self.dtype)
        x = TransformerEncoder(
            d_model=self.d_model, n_layers=self.n_layers, n_heads=self.n_heads,
            d_ff=self.d_ff, use_film=True, dtype=self.dtype, name="transformer",
        )(x, cond_vec)
        return nn.Dense(1, dtype=self.dtype, name="out")(x)[..., 0].astype(jnp.float32)
