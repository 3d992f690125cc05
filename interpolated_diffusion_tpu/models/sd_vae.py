"""SD AutoencoderKL in flax, with diffusers weight conversion.

Completes the frame-VAE capability of the reference (src/models/frame_vae.py
:17 — frozen `AutoencoderKL.from_pretrained` used to encode RGB frames into
the 4-channel, 8×-downsampled SD latent space with 0.18215 scaling): the same
architecture re-implemented as flax modules so the *pretrained* SD VAE runs
natively on TPU (decode for eval/visualization, encode for cache building)
instead of through host-side torch.

Architecture (SD 1.x / sd-vae-ft-ema config): encoder = conv_in → 4 down
blocks (2 resnets each, stride-2 conv downsample with the (0,1,0,1)
asymmetric pad after blocks 0-2) → mid (resnet, 1-head attention, resnet) →
GroupNorm/silu/conv_out to 2·4 moments; quant/post-quant 1×1 convs; decoder
mirrors with 4 up blocks of 3 resnets (nearest-2× upsample + conv after
blocks 0-2). GroupNorm(32, eps 1e-6) throughout, silu activations.

`convert_sd_vae_state_dict` maps the diffusers state dict 1:1 (torch conv
[out,in,kh,kw] → flax [kh,kw,in,out]; attention to_q/... accepted as either
Linear or legacy 1×1-conv layout); `export_sd_vae_state_dict` is the
validated inverse.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SD_SCALE = 0.18215

Dtype = Any


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial positions (VAE mid block)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="group_norm")(x)
        flat = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(flat)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(flat)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(flat)
        logits = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32)
        p = jax.nn.softmax(logits * (C ** -0.5), axis=-1).astype(v.dtype)
        o = jnp.einsum("bqk,bkc->bqc", p, v)
        o = nn.Dense(C, dtype=self.dtype, name="to_out")(o)
        return x + o.reshape(B, H, W, C)


class Downsample(nn.Module):
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # diffusers Downsample2D: asymmetric (0,1,0,1) pad + VALID stride-2
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.ch, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
        return nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv")(x)


class MidBlock(nn.Module):
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.ch, dtype=self.dtype, name="resnet_0")(x)
        x = AttnBlock(dtype=self.dtype, name="attn")(x)
        return ResnetBlock(self.ch, dtype=self.dtype, name="resnet_1")(x)


class SDEncoder(nn.Module):
    block_out: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):   # [B, H, W, 3] in [-1, 1]
        x = nn.Conv(self.block_out[0], (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.block_out):
            for j in range(self.layers_per_block):
                x = ResnetBlock(ch, dtype=self.dtype,
                                name=f"down_{i}_res_{j}")(x)
            if i < len(self.block_out) - 1:
                x = Downsample(ch, dtype=self.dtype, name=f"down_{i}_ds")(x)
        x = MidBlock(self.block_out[-1], dtype=self.dtype, name="mid")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv_out")(x)


class SDDecoder(nn.Module):
    block_out: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):   # [B, h, w, 4]
        rev = tuple(reversed(self.block_out))
        x = nn.Conv(rev[0], (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(z)
        x = MidBlock(rev[0], dtype=self.dtype, name="mid")(x)
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                x = ResnetBlock(ch, dtype=self.dtype, name=f"up_{i}_res_{j}")(x)
            if i < len(rev) - 1:
                x = Upsample(ch, dtype=self.dtype, name=f"up_{i}_us")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_out")(x)


class SDVAE(nn.Module):
    """Pretrained-compatible SD AutoencoderKL with the FrameVAE contract:
    encode [B,T,3,H,W]∈[0,1] → [B,T,4,H/8,W/8] (0.18215-scaled), decode back."""

    block_out: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = SDEncoder(self.block_out, self.layers_per_block,
                                 self.latent_channels, dtype=self.dtype)
        self.decoder = SDDecoder(self.block_out, self.layers_per_block,
                                 self.latent_channels, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode(self, frames: jnp.ndarray, key=None) -> jnp.ndarray:
        B, T = frames.shape[:2]
        x = frames.reshape(B * T, *frames.shape[2:])
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype) * 2.0 - 1.0
        moments = self.quant_conv(self.encoder(x))
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
        z = jnp.transpose(z, (0, 2, 3, 1)).astype(self.dtype)
        x = self.decoder(self.post_quant_conv(z))
        x = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
        x = jnp.transpose(x, (0, 3, 1, 2))
        return x.reshape(B, T, *x.shape[1:]).astype(jnp.float32)

    def __call__(self, frames: jnp.ndarray, key=None):
        z = self.encode(frames, key)
        return self.decode(z), z


# ---------------------------------------------------------------------------
# diffusers weight conversion
# ---------------------------------------------------------------------------

def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _gn(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _lin(sd, name):
    """Attention projection: Linear [out,in] or legacy 1×1 conv [out,in,1,1]."""
    w = np.asarray(sd[f"{name}.weight"])
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return {"kernel": np.ascontiguousarray(w.T),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _resnet(sd, p):
    out = {
        "norm1": _gn(sd, f"{p}.norm1"), "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _gn(sd, f"{p}.norm2"), "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _attn(sd, p):
    to_out = f"{p}.to_out.0" if f"{p}.to_out.0.weight" in sd else f"{p}.proj_attn"
    qn = "to_q" if f"{p}.to_q.weight" in sd else "query"
    kn = "to_k" if f"{p}.to_k.weight" in sd else "key"
    vn = "to_v" if f"{p}.to_v.weight" in sd else "value"
    return {
        "group_norm": _gn(sd, f"{p}.group_norm"),
        "to_q": _lin(sd, f"{p}.{qn}"),
        "to_k": _lin(sd, f"{p}.{kn}"),
        "to_v": _lin(sd, f"{p}.{vn}"),
        "to_out": _lin(sd, to_out),
    }


def convert_sd_vae_state_dict(
    sd: Dict[str, np.ndarray],
    block_out: Sequence[int] = (128, 256, 512, 512),
    layers_per_block: int = 2,
) -> Dict:
    """diffusers AutoencoderKL state dict → SDVAE flax params (numpy)."""
    n = len(block_out)
    enc: Dict = {"conv_in": _conv(sd, "encoder.conv_in"),
                 "conv_norm_out": _gn(sd, "encoder.conv_norm_out"),
                 "conv_out": _conv(sd, "encoder.conv_out"),
                 "mid": {
                     "resnet_0": _resnet(sd, "encoder.mid_block.resnets.0"),
                     "attn": _attn(sd, "encoder.mid_block.attentions.0"),
                     "resnet_1": _resnet(sd, "encoder.mid_block.resnets.1"),
                 }}
    for i in range(n):
        for j in range(layers_per_block):
            enc[f"down_{i}_res_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            enc[f"down_{i}_ds"] = {"conv": _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")}
    dec: Dict = {"conv_in": _conv(sd, "decoder.conv_in"),
                 "conv_norm_out": _gn(sd, "decoder.conv_norm_out"),
                 "conv_out": _conv(sd, "decoder.conv_out"),
                 "mid": {
                     "resnet_0": _resnet(sd, "decoder.mid_block.resnets.0"),
                     "attn": _attn(sd, "decoder.mid_block.attentions.0"),
                     "resnet_1": _resnet(sd, "decoder.mid_block.resnets.1"),
                 }}
    for i in range(n):
        for j in range(layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            dec[f"up_{i}_us"] = {"conv": _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")}
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def export_sd_vae_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse of convert_sd_vae_state_dict (validation/interop)."""
    sd: Dict[str, np.ndarray] = {}

    def put_conv(name, tree):
        sd[f"{name}.weight"] = np.ascontiguousarray(
            np.asarray(tree["kernel"]).transpose(3, 2, 0, 1))
        sd[f"{name}.bias"] = np.asarray(tree["bias"])

    def put_gn(name, tree):
        sd[f"{name}.weight"] = np.asarray(tree["scale"])
        sd[f"{name}.bias"] = np.asarray(tree["bias"])

    def put_lin(name, tree):
        sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(tree["kernel"]).T)
        sd[f"{name}.bias"] = np.asarray(tree["bias"])

    def put_resnet(name, tree):
        put_gn(f"{name}.norm1", tree["norm1"])
        put_conv(f"{name}.conv1", tree["conv1"])
        put_gn(f"{name}.norm2", tree["norm2"])
        put_conv(f"{name}.conv2", tree["conv2"])
        if "conv_shortcut" in tree:
            put_conv(f"{name}.conv_shortcut", tree["conv_shortcut"])

    def put_attn(name, tree):
        put_gn(f"{name}.group_norm", tree["group_norm"])
        put_lin(f"{name}.to_q", tree["to_q"])
        put_lin(f"{name}.to_k", tree["to_k"])
        put_lin(f"{name}.to_v", tree["to_v"])
        put_lin(f"{name}.to_out.0", tree["to_out"])

    for side, tname in (("encoder", "down"), ("decoder", "up")):
        t = params[side]
        put_conv(f"{side}.conv_in", t["conv_in"])
        put_gn(f"{side}.conv_norm_out", t["conv_norm_out"])
        put_conv(f"{side}.conv_out", t["conv_out"])
        put_resnet(f"{side}.mid_block.resnets.0", t["mid"]["resnet_0"])
        put_attn(f"{side}.mid_block.attentions.0", t["mid"]["attn"])
        put_resnet(f"{side}.mid_block.resnets.1", t["mid"]["resnet_1"])
        for key, tree in t.items():
            m = re.match(rf"{tname}_(\d+)_res_(\d+)$", key)
            if m:
                i, j = m.groups()
                put_resnet(f"{side}.{tname}_blocks.{i}.resnets.{j}", tree)
                continue
            m = re.match(rf"{tname}_(\d+)_(ds|us)$", key)
            if m:
                i = m.group(1)
                sub = "downsamplers" if m.group(2) == "ds" else "upsamplers"
                put_conv(f"{side}.{tname}_blocks.{i}.{sub}.0.conv", tree["conv"])
    put_conv("quant_conv", params["quant_conv"])
    put_conv("post_quant_conv", params["post_quant_conv"])
    return sd


def load_sd_vae_safetensors(path: str, **kw) -> Dict:
    """Load an SD VAE safetensors checkpoint (file or directory)."""
    import os

    from .wan_convert import _load_safetensors_any

    files = ([path] if path.endswith(".safetensors") else sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".safetensors")
    ))
    sd: Dict[str, np.ndarray] = {}
    for f in files:
        sd.update(_load_safetensors_any(f))
    return convert_sd_vae_state_dict(sd, **kw)
