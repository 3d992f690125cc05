"""Stage-1 keypoint denoiser and Stage-2 interp-level denoiser.

Parity with reference src/models/denoiser_keypoints.py (KeypointDenoiser :37,
sinusoidal embeddings :11/:24) and src/models/denoiser_interp_levels.py
(InterpLevelDenoiser :11) plus the causal variant
(denoiser_interp_levels_causal.py — same module with causal attention).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .encoders import MazeConditionEncoder
from .transformer import TransformerEncoder

Dtype = Any


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding for integer diffusion timesteps [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def continuous_time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding for continuous positions in [0,1]; [..] -> [.., dim]."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


class KeypointDenoiser(nn.Module):
    """Eps-prediction transformer over K keypoint tokens.

    Inputs per token: [z_t, sinusoid(idx/(T−1)), known_mask, kp_feat]; the
    diffusion timestep enters via sinusoid→MLP added to every token; the cond
    vector is added and FiLM-modulates every block.
    """

    d_model: int = 256
    n_layers: int = 8
    n_heads: int = 8
    d_ff: int = 1024
    dropout: float = 0.0
    d_cond: int = 128
    use_sdf: bool = False
    use_start_goal: bool = True
    data_dim: int = 2
    pos_dim: Optional[int] = None
    kp_feat_dim: int = 0
    maze_channels: Tuple[int, ...] = (32, 64)
    use_remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        z_t: jnp.ndarray,           # [B, K, D]
        t: jnp.ndarray,             # [B] int
        idx: jnp.ndarray,           # [B, K] int
        known_mask: jnp.ndarray,    # [B, K, D] bool
        cond: Optional[Dict[str, jnp.ndarray]],
        T: int,
        deterministic: bool = True,
        blocks_delta: Optional[jnp.ndarray] = None,  # [B, K, d_model] cached
        return_delta: bool = False,
    ) -> jnp.ndarray:
        # blocks_delta/return_delta: FORA-style transformer-stack caching for
        # DDIM sampling (same scheme as WanDiT — see models/wan_dit.py): a
        # full step returns the stack's total residual; a cached step skips
        # all n_layers blocks and reuses it while the input projection,
        # t/cond embeddings, and output head run fresh. Sampling-only.
        B, K, D = z_t.shape
        pos_dim = self.pos_dim if self.pos_dim is not None else self.d_model // 2
        pos = idx.astype(jnp.float32) / max(1.0, float(T - 1))
        pos_emb = continuous_time_embedding(pos, pos_dim)
        if self.kp_feat_dim > 0 and cond is not None and "kp_feat" in cond:
            kp_feat = cond["kp_feat"]
        else:
            kp_feat = jnp.zeros((B, K, self.kp_feat_dim), dtype=z_t.dtype)
        x = jnp.concatenate(
            [z_t, pos_emb, known_mask.astype(z_t.dtype), kp_feat], axis=-1
        ).astype(self.dtype)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="in_proj")(x)

        t_emb = timestep_embedding(t, self.d_model).astype(self.dtype)
        t_emb = nn.Dense(self.d_model, dtype=self.dtype, name="t_fc1")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(self.d_model, dtype=self.dtype, name="t_fc2")(t_emb)
        h = h + t_emb[:, None, :]

        if cond is not None and "cond_vec" in cond:
            # precomputed conditioning vector (samplers hoist the maze CNN
            # out of the DDIM lax.scan — one encoder pass instead of one per
            # diffusion step; see sample/generate.py hoist_cond_vec)
            cond_vec = cond["cond_vec"].astype(self.dtype)
        elif cond is not None and "occ" in cond:
            cond_vec = MazeConditionEncoder(
                use_sdf=self.use_sdf,
                d_cond=self.d_cond,
                use_start_goal=self.use_start_goal,
                maze_channels=self.maze_channels,
                dtype=self.dtype,
                name="cond_enc",
            )(cond)
        else:
            cond_vec = jnp.zeros((B, self.d_cond), dtype=self.dtype)
        h = h + nn.Dense(self.d_model, dtype=self.dtype, name="cond_proj")(cond_vec)[:, None, :]

        h_in = h
        if blocks_delta is not None:
            h = h_in + blocks_delta.astype(h_in.dtype)
        else:
            h = TransformerEncoder(
                d_model=self.d_model,
                n_layers=self.n_layers,
                n_heads=self.n_heads,
                d_ff=self.d_ff,
                dropout=self.dropout,
                use_film=True,
                causal=False,
                use_remat=self.use_remat,
                dtype=self.dtype,
                name="transformer",
            )(h_in, cond_vec, deterministic)
        out = nn.Dense(self.data_dim, dtype=self.dtype, name="out")(h)
        out = out.astype(jnp.float32)
        if return_delta:
            return out, h - h_in
        return out


class InterpLevelDenoiser(nn.Module):
    """Stage-2 delta/x0-prediction transformer over the full T sequence.

    Inputs per token: [x_s, mask channels]; the discrete corruption level s
    enters via a learned embedding→MLP; sinusoidal positions over T. Set
    causal=True for the autoregressive variant.
    """

    d_model: int = 256
    n_layers: int = 8
    n_heads: int = 8
    d_ff: int = 1024
    dropout: float = 0.0
    d_cond: int = 128
    use_sdf: bool = False
    use_start_goal: bool = True
    data_dim: int = 2
    max_levels: int = 8
    mask_channels: int = 1
    maze_channels: Tuple[int, ...] = (32, 64)
    causal: bool = False
    use_remat: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "dense"   # "ring"/"ring_sla": sequence-sharded
                               # attention — apply inside shard_map with T
                               # sharded on `seq_axis` and pass pos_frac
                               # (models/transformer.TransformerBlock)
    seq_axis: str = "seq"

    @nn.compact
    def __call__(
        self,
        x_s: jnp.ndarray,      # [B, T, D]
        s: jnp.ndarray,        # [B] int level
        mask: jnp.ndarray,     # [B, T] or [B, T, mask_channels]
        cond: Optional[Dict[str, jnp.ndarray]],
        deterministic: bool = True,
        pos_frac: Optional[jnp.ndarray] = None,  # [T] global positions in
                               # [0,1] for this (possibly local) T slice;
                               # default linspace assumes x_s spans the
                               # whole sequence
    ) -> jnp.ndarray:
        B, T, D = x_s.shape
        if mask.ndim == 2:
            mask_in = mask[..., None].astype(x_s.dtype)
        else:
            mask_in = mask.astype(x_s.dtype)
        if mask_in.shape[-1] != self.mask_channels:
            raise ValueError(
                f"mask has {mask_in.shape[-1]} channels, expected {self.mask_channels}"
            )
        x = jnp.concatenate([x_s, mask_in], axis=-1).astype(self.dtype)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="in_proj")(x)

        pos = jnp.linspace(0.0, 1.0, T) if pos_frac is None else pos_frac
        pos_emb = continuous_time_embedding(pos, self.d_model).astype(self.dtype)
        h = h + pos_emb[None, :, :]

        lvl = nn.Embed(self.max_levels + 1, self.d_model, dtype=self.dtype, name="level_emb")(s)
        lvl = nn.Dense(self.d_model, dtype=self.dtype, name="lvl_fc1")(lvl)
        lvl = nn.silu(lvl)
        lvl = nn.Dense(self.d_model, dtype=self.dtype, name="lvl_fc2")(lvl)
        h = h + lvl[:, None, :]

        if cond is not None and "cond_vec" in cond:
            cond_vec = cond["cond_vec"].astype(self.dtype)
        elif cond is not None and "occ" in cond:
            cond_vec = MazeConditionEncoder(
                use_sdf=self.use_sdf,
                d_cond=self.d_cond,
                use_start_goal=self.use_start_goal,
                maze_channels=self.maze_channels,
                dtype=self.dtype,
                name="cond_enc",
            )(cond)
        else:
            cond_vec = jnp.zeros((B, self.d_cond), dtype=self.dtype)
        h = h + nn.Dense(self.d_model, dtype=self.dtype, name="cond_proj")(cond_vec)[:, None, :]

        h = TransformerEncoder(
            d_model=self.d_model,
            n_layers=self.n_layers,
            n_heads=self.n_heads,
            d_ff=self.d_ff,
            dropout=self.dropout,
            use_film=True,
            causal=self.causal,
            use_remat=self.use_remat,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            seq_axis=self.seq_axis,
            name="transformer",
        )(h, cond_vec, deterministic)
        # Zero-init delta head (departs from reference denoiser_interp_levels
        # .py:52 default init): at init Stage-2 is exactly the identity
        # refiner (refined == interp), so an undertrained model — or a cold
        # EMA, which stays ≈74% init after 300 steps at decay 0.999 — degrades
        # to "no refinement" instead of rms-1 garbage deltas amplified over
        # `levels` applications.
        out = nn.Dense(self.data_dim, dtype=self.dtype, name="out",
                       kernel_init=nn.initializers.zeros)(h)
        return out.astype(jnp.float32)
