"""Video token denoisers: Stage-1/Stage-2 over [B,K,N,D] / [B,T,N,D] grids.

Parity with reference src/models/video_token_denoisers.py
(VideoTokenKeypointDenoiser :56, VideoTokenInterpLevelDenoiser :129):
1D time sincos × 2D space sincos embeddings, tokens flattened to (K·N)/(T·N)
for full attention through the FiLM transformer.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .denoisers import continuous_time_embedding, timestep_embedding
from .encoders import MazeConditionEncoder, TextConditionEncoder
from .transformer import TransformerEncoder

Dtype = Any


def sincos_1d(n: int, dim: int) -> jnp.ndarray:
    pos = jnp.linspace(0.0, 1.0, n)
    return continuous_time_embedding(pos, dim)


def sincos_2d(h: int, w: int, dim: int) -> jnp.ndarray:
    orig = dim
    if dim % 2 == 1:
        dim -= 1
    half = dim // 2
    eh = sincos_1d(h, half)
    ew = sincos_1d(w, half)
    emb = jnp.concatenate(
        [
            jnp.broadcast_to(eh[:, None, :], (h, w, half)),
            jnp.broadcast_to(ew[None, :, :], (h, w, half)),
        ],
        axis=-1,
    ).reshape(h * w, dim)
    if orig % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _cond_vec(cond: Optional[Dict], d_cond: int, B: int, dtype, use_sdf, use_start_goal,
              parent: nn.Module) -> jnp.ndarray:
    """Maze or text conditioning vector (text for the video workloads)."""
    if cond is not None and "text_embed" in cond:
        return TextConditionEncoder(d_cond=d_cond, dtype=dtype, name="text_enc")(cond)
    if cond is not None and "occ" in cond:
        return MazeConditionEncoder(
            use_sdf=use_sdf, d_cond=d_cond, use_start_goal=use_start_goal,
            dtype=dtype, name="cond_enc",
        )(cond)
    if cond is not None and "start_goal" in cond:
        h = nn.Dense(d_cond, dtype=dtype, name="sg_fc1")(cond["start_goal"].astype(dtype))
        h = nn.silu(h)
        return nn.Dense(d_cond, dtype=dtype, name="sg_fc2")(h)
    return jnp.zeros((B, d_cond), dtype=dtype)


class VideoTokenKeypointDenoiser(nn.Module):
    d_model: int = 512
    n_layers: int = 8
    n_heads: int = 8
    d_ff: int = 2048
    dropout: float = 0.0
    d_cond: int = 128
    use_sdf: bool = False
    use_start_goal: bool = True
    data_dim: int = 256
    use_remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        z_t: jnp.ndarray,    # [B,K,N,D]
        t: jnp.ndarray,      # [B]
        idx: jnp.ndarray,    # [B,K]
        cond: Optional[Dict[str, jnp.ndarray]],
        T: int,
        spatial_shape: Tuple[int, int],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, K, N, D = z_t.shape
        h = nn.Dense(self.d_model, dtype=self.dtype, name="in_proj")(z_t.astype(self.dtype))
        time_emb = sincos_1d(T, self.d_model)[idx].astype(self.dtype)    # [B,K,dm]
        H_p, W_p = spatial_shape
        space_emb = sincos_2d(H_p, W_p, self.d_model).astype(self.dtype)  # [N,dm]
        h = h + time_emb[:, :, None, :] + space_emb[None, None]

        t_emb = timestep_embedding(t, self.d_model).astype(self.dtype)
        t_emb = nn.Dense(self.d_model, dtype=self.dtype, name="t_fc1")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(self.d_model, dtype=self.dtype, name="t_fc2")(t_emb)
        h = h + t_emb[:, None, None, :]

        cond_vec = _cond_vec(cond, self.d_cond, B, self.dtype, self.use_sdf,
                             self.use_start_goal, self)
        h = h + nn.Dense(self.d_model, dtype=self.dtype, name="cond_proj")(cond_vec)[:, None, None, :]

        h = h.reshape(B, K * N, self.d_model)
        h = TransformerEncoder(
            d_model=self.d_model, n_layers=self.n_layers, n_heads=self.n_heads,
            d_ff=self.d_ff, dropout=self.dropout, use_film=True,
            use_remat=self.use_remat, dtype=self.dtype, name="transformer",
        )(h, cond_vec, deterministic)
        out = nn.Dense(self.data_dim, dtype=self.dtype, name="out")(h)
        return out.reshape(B, K, N, D).astype(jnp.float32)


class VideoTokenInterpLevelDenoiser(nn.Module):
    d_model: int = 512
    n_layers: int = 8
    n_heads: int = 8
    d_ff: int = 2048
    dropout: float = 0.0
    d_cond: int = 128
    use_sdf: bool = False
    use_start_goal: bool = True
    data_dim: int = 256
    max_levels: int = 8
    mask_channels: int = 1
    use_remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_s: jnp.ndarray,    # [B,T,N,D]
        s: jnp.ndarray,      # [B]
        mask: jnp.ndarray,   # [B,T,N] or [B,T,N,C]
        cond: Optional[Dict[str, jnp.ndarray]],
        spatial_shape: Tuple[int, int],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, T, N, D = x_s.shape
        mask_in = mask[..., None] if mask.ndim == 3 else mask
        mask_in = mask_in.astype(x_s.dtype)
        if mask_in.shape[-1] != self.mask_channels:
            raise ValueError(
                f"mask has {mask_in.shape[-1]} channels, expected {self.mask_channels}"
            )
        x = jnp.concatenate([x_s, mask_in], axis=-1).astype(self.dtype)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="in_proj")(x)

        time_emb = sincos_1d(T, self.d_model).astype(self.dtype)
        H_p, W_p = spatial_shape
        space_emb = sincos_2d(H_p, W_p, self.d_model).astype(self.dtype)
        pos = (time_emb[:, None, :] + space_emb[None]).reshape(T * N, self.d_model)
        h = h.reshape(B, T * N, self.d_model) + pos[None]

        lvl = nn.Embed(self.max_levels + 1, self.d_model, dtype=self.dtype, name="level_emb")(s)
        lvl = nn.Dense(self.d_model, dtype=self.dtype, name="lvl_fc1")(lvl)
        lvl = nn.silu(lvl)
        lvl = nn.Dense(self.d_model, dtype=self.dtype, name="lvl_fc2")(lvl)
        h = h + lvl[:, None, :]

        cond_vec = _cond_vec(cond, self.d_cond, B, self.dtype, self.use_sdf,
                             self.use_start_goal, self)
        h = h + nn.Dense(self.d_model, dtype=self.dtype, name="cond_proj")(cond_vec)[:, None, :]

        h = TransformerEncoder(
            d_model=self.d_model, n_layers=self.n_layers, n_heads=self.n_heads,
            d_ff=self.d_ff, dropout=self.dropout, use_film=True,
            use_remat=self.use_remat, dtype=self.dtype, name="transformer",
        )(h, cond_vec, deterministic)
        # zero-init delta head — identity refiner at init (see
        # models/denoisers.py InterpLevelDenoiser)
        out = nn.Dense(self.data_dim, dtype=self.dtype, name="out",
                       kernel_init=nn.initializers.zeros)(h)
        return out.reshape(B, T, N, D).astype(jnp.float32)
