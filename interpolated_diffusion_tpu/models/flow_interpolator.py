"""Learned latent flow interpolator (optical-flow warp + residual refine).

Capability parity with reference src/models/latent_flow_interpolator.py:
UNet-ish bidirectional flow predictor with optional time-dependent blend mask,
uncertainty head, and cost volume (:72-189); bilinear backward warping
(:51-69); residual refiner (:38); and the segment-wise
`interpolate(latents, idx)` driver (:310).

TPU-native: convs run NHWC internally; the per-sample/per-segment Python
loops of the reference driver become one vectorized pass — flows are
predicted for all B·(K−1) anchor segments at once, then every frame gathers
its segment's flow and blends at its own α.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import cost_volume, resize_bilinear, warp

Dtype = Any


def _nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


class _ConvBlock(nn.Module):
    out_ch: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", dtype=self.dtype, name="conv1")(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(x)
        return nn.silu(x)


class _ResBlock(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.silu(nn.Conv(self.channels, (3, 3), padding="SAME",
                            dtype=self.dtype, name="conv1")(x))
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        return nn.silu(h + x)


class LatentResidualRefiner(nn.Module):
    hidden_channels: int
    out_channels: int
    n_blocks: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        h = nn.Conv(self.hidden_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name="in_proj")(x)
        for i in range(max(0, self.n_blocks)):
            h = _ResBlock(self.hidden_channels, dtype=self.dtype, name=f"res_{i}")(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name="out_proj")(h)


class LatentFlowPredictor(nn.Module):
    """(z0, z1[, cond]) -> (flow01, flow10, mask_a, mask_b, uncertainty)."""

    in_channels: int
    base_channels: int = 32
    max_flow: float = 20.0
    cond_channels: int = 0
    time_mask: bool = False
    use_cost_volume: bool = False
    cv_radius: int = 2
    cv_downscale: int = 2
    cv_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z0, z1, cond=None):  # z0/z1: [B,C,H,W]
        feats = [z0, z1]
        if self.cond_channels > 0:
            if cond is None:
                raise ValueError("cond is required when cond_channels > 0")
            if cond.ndim == 2:
                cond = cond[:, :, None, None]
            cond = jnp.broadcast_to(
                cond, (*cond.shape[:2], z0.shape[-2], z0.shape[-1])
            )
            feats.append(cond)
        if self.use_cost_volume:
            feats.append(cost_volume(z0, z1, self.cv_radius, self.cv_downscale, self.cv_norm))
        x = _nchw_to_nhwc(jnp.concatenate(feats, axis=1)).astype(self.dtype)
        h1 = _ConvBlock(self.base_channels, dtype=self.dtype, name="enc1")(x)
        h2 = _ConvBlock(self.base_channels * 2, stride=2, dtype=self.dtype, name="enc2")(h1)
        h3 = _ConvBlock(self.base_channels * 2, dtype=self.dtype, name="enc3")(h2)
        h3_up = _nchw_to_nhwc(resize_bilinear(_nhwc_to_nchw(h3), h1.shape[1:3]))
        h = _ConvBlock(self.base_channels, dtype=self.dtype, name="dec1")(
            jnp.concatenate([h3_up, h1], axis=-1)
        )
        out_ch = 7 if self.time_mask else 6
        out = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=self.dtype, name="out")(h)
        out = _nhwc_to_nchw(out).astype(jnp.float32)
        flow01 = jnp.tanh(out[:, 0:2]) * self.max_flow
        flow10 = jnp.tanh(out[:, 2:4]) * self.max_flow
        if self.time_mask:
            mask_a = out[:, 4:5]
            mask_b = out[:, 5:6]
            unc = jax.nn.sigmoid(out[:, 6:7])
        else:
            mask_a = jax.nn.sigmoid(out[:, 4:5])
            mask_b = jnp.zeros_like(mask_a)
            unc = jax.nn.sigmoid(out[:, 5:6])
        return flow01, flow10, mask_a, mask_b, unc


class LatentFlowInterpolator(nn.Module):
    """Flow-warped blending + optional residual refinement between anchors."""

    in_channels: int
    base_channels: int = 32
    max_flow: float = 20.0
    residual_channels: Optional[int] = None
    residual_blocks: int = 2
    time_mask: bool = False
    gap_cond: bool = False
    use_cost_volume: bool = False
    cv_radius: int = 2
    cv_downscale: int = 2
    cv_norm: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.net = LatentFlowPredictor(
            in_channels=self.in_channels,
            base_channels=self.base_channels,
            max_flow=self.max_flow,
            cond_channels=1 if self.gap_cond else 0,
            time_mask=self.time_mask,
            use_cost_volume=self.use_cost_volume,
            cv_radius=self.cv_radius,
            cv_downscale=self.cv_downscale,
            cv_norm=self.cv_norm,
            dtype=self.dtype,
        )
        if self.residual_blocks > 0:
            self.residual = LatentResidualRefiner(
                hidden_channels=self.residual_channels or self.base_channels,
                out_channels=self.in_channels,
                n_blocks=self.residual_blocks,
                dtype=self.dtype,
            )
        else:
            self.residual = None

    def predict_flow(self, z0, z1, gap=None):
        if self.gap_cond:
            if gap is None:
                raise ValueError("gap must be provided when gap_cond is enabled")
            if gap.ndim == 1:
                gap = gap[:, None]
            return self.net(z0, z1, gap)
        return self.net(z0, z1)

    def blend_from_flow(self, z0, z1, alpha, flow01, flow10, mask_a,
                        mask_b=None, gap=None):
        if alpha.ndim == 1:
            alpha = alpha[:, None, None, None]
        alpha = jnp.clip(alpha.astype(z0.dtype), 0.0, 1.0)
        if self.time_mask:
            if mask_b is None:
                raise ValueError("mask_b must be provided when time_mask is enabled")
            mask = jax.nn.sigmoid(mask_a + mask_b * (2.0 * alpha - 1.0))
        else:
            mask = mask_a
        z0_w = warp(z0, -alpha * flow01)
        z1_w = warp(z1, -(1.0 - alpha) * flow10)
        z_t = mask * z0_w + (1.0 - mask) * z1_w
        if self.residual is not None:
            t_chan = jnp.broadcast_to(alpha, (z_t.shape[0], 1, *z_t.shape[-2:]))
            feats = [z_t, z0, z1, t_chan]
            if self.gap_cond:
                if gap is None:
                    raise ValueError("gap must be provided when gap_cond is enabled")
                if gap.ndim == 1:
                    gap = gap[:, None]
                gap_chan = jnp.broadcast_to(
                    gap[:, :, None, None], (z_t.shape[0], 1, *z_t.shape[-2:])
                ).astype(z_t.dtype)
                feats.append(gap_chan)
            res_in = _nchw_to_nhwc(jnp.concatenate(feats, axis=1)).astype(self.dtype)
            z_t = z_t + _nhwc_to_nchw(self.residual(res_in)).astype(z_t.dtype)
        return z_t

    def interpolate_pair(self, z0, z1, alpha, gap=None):
        flow01, flow10, mask_a, mask_b, unc = self.predict_flow(z0, z1, gap=gap)
        z_t = self.blend_from_flow(z0, z1, alpha, flow01, flow10, mask_a, mask_b, gap=gap)
        return z_t, unc

    def __call__(self, latents: jnp.ndarray, idx: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Segment-wise interpolation of [B,T,C,H,W] at sorted anchor idx [B,K].

        Vectorized: flows for all B·(K−1) segments at once, every frame
        gathers its segment and blends at its own α. Returns (out, conf)
        where conf = 1 at anchors and the predicted (1 − uncertainty) inside.
        """
        B, T, C, H, W = latents.shape
        K = idx.shape[1]
        # segment endpoints and flows
        z_l = jnp.take_along_axis(latents, idx[:, :-1, None, None, None], axis=1)
        z_r = jnp.take_along_axis(latents, idx[:, 1:, None, None, None], axis=1)
        z_l2 = z_l.reshape(B * (K - 1), C, H, W)
        z_r2 = z_r.reshape(B * (K - 1), C, H, W)
        gap = (idx[:, 1:] - idx[:, :-1]).astype(jnp.float32).reshape(-1)
        flow01, flow10, mask_a, mask_b, unc = self.predict_flow(
            z_l2, z_r2, gap=gap if self.gap_cond else None
        )

        # per-frame segment lookup
        t_grid = jnp.arange(T, dtype=idx.dtype)
        seg = jax.vmap(lambda a: jnp.searchsorted(a, t_grid, side="right"))(idx) - 1
        seg = jnp.clip(seg, 0, K - 2)                      # [B,T]
        left = jnp.take_along_axis(idx, seg, axis=1)
        right = jnp.take_along_axis(idx, seg + 1, axis=1)
        alpha = (t_grid[None] - left) / jnp.maximum(right - left, 1)

        def per_b(args):
            fl01, fl10, ma, mb, zl, zr, seg_b, alpha_b, gap_b = args
            # gather per-frame segment data: [T, ...]
            fl01_t = fl01[seg_b]
            fl10_t = fl10[seg_b]
            ma_t = ma[seg_b]
            mb_t = mb[seg_b]
            zl_t = zl[seg_b]
            zr_t = zr[seg_b]
            g_t = gap_b[seg_b]
            return self.blend_from_flow(
                zl_t, zr_t, alpha_b.astype(jnp.float32), fl01_t, fl10_t, ma_t,
                mb_t, gap=g_t if self.gap_cond else None,
            )

        flow01 = flow01.reshape(B, K - 1, 2, H, W)
        flow10 = flow10.reshape(B, K - 1, 2, H, W)
        mask_a = mask_a.reshape(B, K - 1, 1, H, W)
        mask_b = mask_b.reshape(B, K - 1, 1, H, W)
        unc = unc.reshape(B, K - 1, 1, H, W)
        zl = z_l.reshape(B, K - 1, C, H, W)
        zr = z_r.reshape(B, K - 1, C, H, W)
        gap_b = gap.reshape(B, K - 1)

        out = jax.vmap(per_b)(
            (flow01, flow10, mask_a, mask_b, zl, zr, seg, alpha, gap_b)
        )  # [B,T,C,H,W]
        # anchors exact
        b_ix = jnp.arange(B)[:, None]
        out = out.at[b_ix, idx].set(jnp.take_along_axis(
            latents, idx[:, :, None, None, None], axis=1))
        conf = jax.vmap(lambda u, s: (1.0 - u[s][:, 0]))(unc, seg)  # [B,T,H,W]
        conf_anchor = jnp.ones((B, K, H, W), dtype=conf.dtype)
        conf = conf.at[b_ix, idx].set(conf_anchor)
        return out, conf
