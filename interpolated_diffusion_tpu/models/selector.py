"""Learned keypoint selection models.

Parity with reference src/models/keypoint_selector.py (KeypointSelector :40 —
conv spatial tokens + start/goal gaussian heatmaps, time queries cross-attend
to spatial memory, optional SG/goal-dist tokens, cond bias, level
conditioning; select_topk_indices :203 deterministic/Gumbel) and
src/models/segment_cost.py (SegmentCostPredictor :11 — D_phi cost MLP over
cond vector + per-segment features).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .denoisers import continuous_time_embedding
from .encoders import MazeConditionEncoder

Dtype = Any


class SegmentCostPredictor(nn.Module):
    """D_phi: (cond, [i/T, j/T, gap/T]) -> scalar cost per segment."""

    d_cond: int = 128
    seg_feat_dim: int = 3
    hidden_dim: int = 256
    n_layers: int = 3
    use_sdf: bool = False
    use_start_goal: bool = True
    maze_channels: Tuple[int, ...] = (32, 64)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Dict[str, jnp.ndarray], seg_feat: jnp.ndarray) -> jnp.ndarray:
        cond_vec = MazeConditionEncoder(
            use_sdf=self.use_sdf, d_cond=self.d_cond,
            use_start_goal=self.use_start_goal, maze_channels=self.maze_channels,
            dtype=self.dtype, name="cond_enc",
        )(cond)
        if seg_feat.ndim == 2:
            seg_feat = jnp.broadcast_to(
                seg_feat[None], (cond_vec.shape[0], *seg_feat.shape)
            )
        if seg_feat.shape[-1] != self.seg_feat_dim:
            raise ValueError("seg_feat_dim mismatch")
        cond_exp = jnp.broadcast_to(
            cond_vec[:, None, :], (cond_vec.shape[0], seg_feat.shape[1], self.d_cond)
        )
        x = jnp.concatenate([cond_exp, seg_feat.astype(self.dtype)], axis=-1)
        for i in range(max(1, self.n_layers - 1)):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"fc_{i}")(x)
            x = nn.silu(x)
        out = nn.Dense(1, dtype=self.dtype, name="out")(x)
        return out[..., 0].astype(jnp.float32)


class CrossAttnBlock(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, kv: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(q)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, name="attn"
        )(h, kv)
        x = q + attn
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="ff1")(h)
        h = nn.silu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(h)
        return x + h


class KeypointSelector(nn.Module):
    """Per-frame keypoint logits from maze conditioning.

    Spatial conv tokens (occ [+sdf] [+start/goal gaussian heatmaps]) form the
    memory; T sinusoidal time queries cross-attend into it; optional extra
    tokens (start/goal vector, goal distance), query-side cond bias, and
    level conditioning.
    """

    T: int
    d_model: int = 256
    n_heads: int = 8
    d_ff: int = 512
    n_layers: int = 2
    pos_dim: int = 64
    use_sdf: bool = False
    use_start_goal: bool = True
    use_sg_map: bool = True
    use_sg_token: bool = True
    use_goal_dist_token: bool = False
    use_cond_bias: bool = False
    cond_bias_mode: str = "memory"  # memory | encoder
    use_level: bool = False
    sg_map_sigma: float = 1.5
    maze_channels: Tuple[int, ...] = (32, 64)
    dtype: Dtype = jnp.float32

    def _sg_map(self, start_goal: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        """Gaussian heatmaps for start/goal: [B, 2, H, W]."""
        B = start_goal.shape[0]
        yy, xx = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        )
        sx = jnp.clip(start_goal[:, 0], 0, 1)[:, None, None] * (W - 1)
        sy = jnp.clip(start_goal[:, 1], 0, 1)[:, None, None] * (H - 1)
        gx = jnp.clip(start_goal[:, 2], 0, 1)[:, None, None] * (W - 1)
        gy = jnp.clip(start_goal[:, 3], 0, 1)[:, None, None] * (H - 1)
        if self.sg_map_sigma <= 0:
            s_map = (
                (jnp.round(sx) == xx[None]) & (jnp.round(sy) == yy[None])
            ).astype(jnp.float32)
            g_map = (
                (jnp.round(gx) == xx[None]) & (jnp.round(gy) == yy[None])
            ).astype(jnp.float32)
        else:
            s2 = 2.0 * self.sg_map_sigma ** 2
            s_map = jnp.exp(-((xx[None] - sx) ** 2 + (yy[None] - sy) ** 2) / s2)
            g_map = jnp.exp(-((xx[None] - gx) ** 2 + (yy[None] - gy) ** 2) / s2)
        return jnp.stack([s_map, g_map], axis=1)

    @nn.compact
    def __call__(self, cond: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        occ = cond["occ"]
        feats = [occ]
        if self.use_sdf:
            if cond.get("sdf") is None:
                raise ValueError("use_sdf is True but sdf missing from cond")
            feats.append(cond["sdf"])
        if self.use_start_goal and self.use_sg_map:
            if "start_goal" not in cond:
                raise ValueError("use_start_goal is True but start_goal missing")
            feats.append(self._sg_map(cond["start_goal"], occ.shape[-2], occ.shape[-1]))
        x = jnp.concatenate(feats, axis=1)
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        for i, c in enumerate(self.maze_channels):
            x = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.silu(x)
        if x.shape[-1] != self.d_model:
            x = nn.Conv(self.d_model, (1, 1), dtype=self.dtype, name="proj")(x)
        B, H, W, C = x.shape
        spatial = x.reshape(B, H * W, C)
        tokens = [spatial]
        if self.use_start_goal and self.use_sg_token:
            sg = cond["start_goal"].astype(self.dtype)
            h = nn.Dense(self.d_model, dtype=self.dtype, name="sg_fc1")(sg)
            h = nn.silu(h)
            h = nn.Dense(self.d_model, dtype=self.dtype, name="sg_fc2")(h)
            tokens.insert(0, h[:, None, :])
        if self.use_goal_dist_token:
            sg = cond["start_goal"]
            gd = jnp.linalg.norm(sg[:, :2] - sg[:, 2:], axis=-1, keepdims=True)
            h = nn.Dense(self.d_model, dtype=self.dtype, name="gd_fc1")(gd.astype(self.dtype))
            h = nn.silu(h)
            h = nn.Dense(self.d_model, dtype=self.dtype, name="gd_fc2")(h)
            tokens.insert(0, h[:, None, :])
        memory = jnp.concatenate(tokens, axis=1)

        t = jnp.linspace(0.0, 1.0, self.T)
        time_emb = continuous_time_embedding(t, self.pos_dim).astype(self.dtype)
        q = nn.Dense(self.d_model, dtype=self.dtype, name="time_proj")(time_emb)
        q = jnp.broadcast_to(q[None], (B, self.T, self.d_model))
        if self.use_cond_bias:
            if self.cond_bias_mode == "encoder":
                cond_vec = MazeConditionEncoder(
                    use_sdf=self.use_sdf, d_cond=self.d_model,
                    use_start_goal=self.use_start_goal,
                    maze_channels=self.maze_channels,
                    dtype=self.dtype, name="cond_enc",
                )(cond)
            else:
                cond_vec = memory.mean(axis=1)
            h = nn.Dense(self.d_model, dtype=self.dtype, name="bias_fc1")(cond_vec)
            h = nn.silu(h)
            h = nn.Dense(self.d_model, dtype=self.dtype, name="bias_fc2")(h)
            q = q + h[:, None, :]
        if self.use_level:
            level = cond.get("level")
            if level is None:
                raise ValueError("use_level is True but level missing from cond")
            if level.ndim == 1:
                level = level[:, None]
            h = nn.Dense(self.d_model, dtype=self.dtype, name="lvl_fc1")(level.astype(self.dtype))
            h = nn.silu(h)
            h = nn.Dense(self.d_model, dtype=self.dtype, name="lvl_fc2")(h)
            q = q + h[:, None, :]
        for i in range(max(1, self.n_layers)):
            q = CrossAttnBlock(
                d_model=self.d_model, n_heads=self.n_heads, d_ff=self.d_ff,
                dtype=self.dtype, name=f"block_{i}",
            )(q, memory)
        out = nn.Dense(1, dtype=self.dtype, name="out")(q)
        return out[..., 0].astype(jnp.float32)


def select_topk_indices(
    logits: jnp.ndarray,
    K: int,
    stochastic: bool = False,
    tau: float = 1.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Top-K interior frames by logit (endpoints forced), optionally Gumbel."""
    if logits.ndim != 2:
        raise ValueError("logits must be [B,T]")
    B, T = logits.shape
    if K < 2:
        raise ValueError("K must be >= 2")
    K = min(K, T)
    ends = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.full((B, 1), T - 1, jnp.int32)], axis=1
    )
    if K == 2:
        return ends
    interior = logits[:, 1:-1]
    if stochastic:
        if key is None:
            raise ValueError("stochastic selection needs a PRNG key")
        g = jax.random.gumbel(key, interior.shape)
        scores = (interior + g) / (tau if tau > 0 else 1.0)
    else:
        scores = interior
    _, top = jax.lax.top_k(scores, K - 2)
    idx = jnp.concatenate([ends[:, :1], (top + 1).astype(jnp.int32), ends[:, 1:]], axis=1)
    return jnp.sort(idx, axis=1)
