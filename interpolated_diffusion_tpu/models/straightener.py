"""Latent straighteners: make LERP ≈ geodesic in a learned space.

Capability parity with reference src/models/latent_straightener.py:
conv encoder/decoder variant (LatentStraightener :230), token-grid
transformer variant with zero-init delta head
(LatentStraightenerTokenTransformer :66/:130), and `interpolate_pair`
(encode → lerp → decode, :272). The meta-dispatched loader lives in
models/loading conventions (stage="straightener", arch conv|token).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..utils.video_tokens import patchify_latents, unpatchify_tokens
from .transformer import TransformerEncoder
from .video_denoisers import sincos_2d

Dtype = Any


class _StraightenerNet(nn.Module):
    """Conv stack with optional global residual (near-identity init)."""

    in_channels: int
    hidden_channels: int = 64
    blocks: int = 2
    use_residual: bool = True
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):  # [B,C,H,W]
        k = (self.kernel_size, self.kernel_size)
        x = jnp.transpose(z, (0, 2, 3, 1)).astype(self.dtype)
        h = nn.Conv(self.hidden_channels, k, padding="SAME", dtype=self.dtype, name="in_conv")(x)
        h = nn.silu(h)
        for i in range(max(0, self.blocks)):
            r = nn.Conv(self.hidden_channels, k, padding="SAME", dtype=self.dtype,
                        name=f"block_{i}_conv1")(h)
            r = nn.silu(r)
            r = nn.Conv(self.hidden_channels, k, padding="SAME", dtype=self.dtype,
                        name=f"block_{i}_conv2")(r)
            h = nn.silu(h + r)
        out = nn.Conv(self.in_channels, k, padding="SAME",
                      kernel_init=nn.initializers.zeros, dtype=self.dtype,
                      name="out_conv")(h)
        out = jnp.transpose(out, (0, 3, 1, 2)).astype(z.dtype)
        return z + out if self.use_residual else out


class LatentStraightener(nn.Module):
    """Conv encoder/decoder pair; lerp happens in the straightened space."""

    in_channels: int
    hidden_channels: int = 64
    blocks: int = 2
    use_residual: bool = True
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(
            in_channels=self.in_channels, hidden_channels=self.hidden_channels,
            blocks=self.blocks, use_residual=self.use_residual,
            kernel_size=self.kernel_size, dtype=self.dtype,
        )
        self.encoder = _StraightenerNet(**kw)
        self.decoder = _StraightenerNet(**kw)

    def encode(self, z):
        return self.encoder(z)

    def decode(self, s):
        return self.decoder(s)

    def __call__(self, z):
        return self.decode(self.encode(z))

    def interpolate_pair(self, z0, z1, alpha) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if alpha.ndim == 1:
            alpha = alpha[:, None, None, None]
        alpha = jnp.clip(alpha.astype(z0.dtype), 0.0, 1.0)
        s0, s1 = self.encode(z0), self.encode(z1)
        s = (1.0 - alpha) * s0 + alpha * s1
        return self.decode(s), s


class _TokenTransformerNet(nn.Module):
    token_dim: int
    patch_size: int
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 8
    d_ff: int = 1024
    use_residual: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B,C,H,W]
        tokens, (hp, wp) = patchify_latents(x[:, None], self.patch_size)
        tok = tokens[:, 0].astype(self.dtype)  # [B,N,token_dim]
        h = tok
        if self.d_model != self.token_dim:
            h = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="in_proj")(h)
        h = h + sincos_2d(hp, wp, self.d_model).astype(self.dtype)[None]
        h = TransformerEncoder(
            d_model=self.d_model, n_layers=self.n_layers, n_heads=self.n_heads,
            d_ff=self.d_ff, use_film=False, dtype=self.dtype, name="tr",
        )(h)
        # zero-init delta head → near-identity at init when residual
        h = nn.Dense(self.token_dim, use_bias=False,
                     kernel_init=nn.initializers.zeros, dtype=self.dtype,
                     name="out_proj")(h)
        delta = unpatchify_tokens(h[:, None].astype(x.dtype), self.patch_size, (hp, wp))[:, 0]
        return x + delta if self.use_residual else delta


class LatentStraightenerTokenTransformer(nn.Module):
    """Token-grid transformer straightener (patchify→transformer→unpatchify)."""

    in_channels: int
    patch_size: int = 4
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 8
    d_ff: int = 1024
    use_residual: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(
            token_dim=self.in_channels * self.patch_size ** 2,
            patch_size=self.patch_size, d_model=self.d_model,
            n_layers=self.n_layers, n_heads=self.n_heads, d_ff=self.d_ff,
            use_residual=self.use_residual, dtype=self.dtype,
        )
        self.encoder = _TokenTransformerNet(**kw)
        self.decoder = _TokenTransformerNet(**kw)

    def encode(self, z):
        return self.encoder(z)

    def decode(self, s):
        return self.decoder(s)

    def __call__(self, z):
        return self.decode(self.encode(z))

    def interpolate_pair(self, z0, z1, alpha) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if alpha.ndim == 1:
            alpha = alpha[:, None, None, None]
        alpha = jnp.clip(alpha.astype(z0.dtype), 0.0, 1.0)
        s0, s1 = self.encode(z0), self.encode(z1)
        s = (1.0 - alpha) * s0 + alpha * s1
        return self.decode(s), s


def load_latent_straightener(path: str, sample_hw: Tuple[int, int] = (60, 104)):
    """Meta-dispatched loader (reference latent_straightener.py:286).

    Resolves a checkpoint dir (or run dir of ckpt_N subdirs), rebuilds the
    conv or token variant from meta, and returns (model, params, meta).
    """
    import jax

    from ..utils.checkpoint import load_checkpoint, read_meta
    from .loading import resolve_ckpt

    path = resolve_ckpt(path)
    _, meta = read_meta(path)
    if meta.get("stage") != "straightener":
        raise ValueError(f"{path} is not a straightener checkpoint")
    c = int(meta["in_channels"])
    if meta.get("arch", "conv") == "conv":
        model = LatentStraightener(
            in_channels=c, hidden_channels=int(meta["hidden_channels"]),
            blocks=int(meta["blocks"]),
        )
    else:
        model = LatentStraightenerTokenTransformer(
            in_channels=c, patch_size=int(meta["token_patch"]),
            d_model=int(meta["token_d_model"]),
            n_layers=int(meta["token_layers"]),
        )
    h, w = sample_hw
    tmpl = model.init(jax.random.PRNGKey(0), jnp.zeros((1, c, h, w)))["params"]
    _, payload = load_checkpoint(path, tmpl)
    return model, payload["params"], meta
