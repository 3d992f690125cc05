"""Wan2.1 pretrained-weight conversion: diffusers safetensors → WanDiT params.

Capability parity with the reference's backbone loading
(src/models/wan_backbone.py:21 — `WanTransformer3DModel.from_pretrained`):
on TPU there is no diffusers/torch in the accelerator path, so the
pretrained checkpoint is converted once, host-side, from its safetensors
shards into the WanDiT flax param tree (loop or scan layout) and saved with
the framework's own checkpointing.

Name mapping (diffusers WanTransformer3DModel state dict → WanDiT):

    patch_embedding.{weight,bias}                → patch_embed (conv3d kernel
                                                   [dim,C,pt,ph,pw] flattened
                                                   to [C·pt·ph·pw, dim])
    condition_embedder.time_embedder.linear_1    → time_fc1 (input rows
                                                   permuted: diffusers'
                                                   Timesteps flips to
                                                   [cos|sin]; our
                                                   timestep_embedding emits
                                                   [sin|cos])
    condition_embedder.time_embedder.linear_2    → time_fc2
    condition_embedder.time_proj                 → time_proj
    condition_embedder.text_embedder.linear_{1,2}→ text_fc{1,2}
    scale_shift_table                            → head_scale_shift
    proj_out                                     → proj_out
    blocks.{i}.scale_shift_table                 → block_i/scale_shift_table
    blocks.{i}.attn1.{to_q,to_k,to_v,to_out.0}   → block_i/self_attn/{q,k,v,o}_proj
    blocks.{i}.attn1.norm_{q,k}.weight           → block_i/self_attn/{q,k}_norm/scale
    blocks.{i}.attn2.*                           → block_i/cross_attn/* (same)
    blocks.{i}.norm2.{weight,bias}               → block_i/norm2/{scale,bias}
    blocks.{i}.ffn.net.0.proj                    → block_i/ffn_in
    blocks.{i}.ffn.net.2                         → block_i/ffn_out

All linear weights transpose ([out,in] → [in,out]). norm1/norm3 have no
affine params on either side. RoPE has no params. The I2V image-context
projections (attn2.add_k_proj/add_v_proj/norm_added_k) are not part of the
T2V-1.3B family and raise if present unless `strict=False`.

Validated by an exact round-trip against `export_wan_state_dict` (the
inverse map) and by shape-checking against a WanDiT init — true
numerical parity against diffusers requires the real weights (zero-egress
environment); the forward semantics (mod order, qk-norm placement, head
modulation by t_emb) follow the diffusers Wan block structure the reference
drives through src/models/wan_sla.py.
"""
from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np

__all__ = [
    "convert_wan_state_dict",
    "export_wan_state_dict",
    "load_wan_safetensors",
]


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _flip_sincos_rows(w_t: np.ndarray) -> np.ndarray:
    """Permute linear_1 kernel input rows [cos|sin] → [sin|cos]."""
    half = w_t.shape[0] // 2
    return np.concatenate([w_t[half:], w_t[:half]], axis=0)


def _attn_tree(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    out = {
        "q_proj": {"kernel": _t(sd[f"{prefix}.to_q.weight"]),
                   "bias": sd[f"{prefix}.to_q.bias"]},
        "k_proj": {"kernel": _t(sd[f"{prefix}.to_k.weight"]),
                   "bias": sd[f"{prefix}.to_k.bias"]},
        "v_proj": {"kernel": _t(sd[f"{prefix}.to_v.weight"]),
                   "bias": sd[f"{prefix}.to_v.bias"]},
        "o_proj": {"kernel": _t(sd[f"{prefix}.to_out.0.weight"]),
                   "bias": sd[f"{prefix}.to_out.0.bias"]},
        "q_norm": {"scale": sd[f"{prefix}.norm_q.weight"]},
        "k_norm": {"scale": sd[f"{prefix}.norm_k.weight"]},
    }
    return out


def convert_wan_state_dict(
    sd: Dict[str, np.ndarray],
    n_layers: Optional[int] = None,
    layer_mode: str = "loop",
    strict: bool = True,
) -> Dict:
    """diffusers WanTransformer3DModel state dict → WanDiT params (numpy).

    `sd` maps torch names to numpy arrays (use safetensors.numpy or
    `{k: v.numpy() for k, v in torch_sd.items()}`). Returns the param tree
    for `WanDiT(layer_mode=...)`; dtypes pass through unchanged.
    """
    if n_layers is None:
        n_layers = 1 + max(
            int(m.group(1)) for k in sd
            if (m := re.match(r"blocks\.(\d+)\.", k))
        )
    if strict:
        i2v = [k for k in sd if "add_k_proj" in k or "add_v_proj" in k
               or "norm_added" in k]
        if i2v:
            raise ValueError(
                f"I2V image-context weights present ({i2v[:2]}…); the T2V "
                "WanDiT has no image cross-attention — pass strict=False to skip"
            )

    dim = sd["patch_embedding.weight"].shape[0]
    pw = sd["patch_embedding.weight"]          # [dim, C, pt, ph, pw]
    params: Dict = {
        "patch_embed": {
            "kernel": _t(pw.reshape(dim, -1)),
            "bias": sd["patch_embedding.bias"],
        },
        "time_fc1": {
            "kernel": _flip_sincos_rows(
                _t(sd["condition_embedder.time_embedder.linear_1.weight"])
            ),
            "bias": sd["condition_embedder.time_embedder.linear_1.bias"],
        },
        "time_fc2": {
            "kernel": _t(sd["condition_embedder.time_embedder.linear_2.weight"]),
            "bias": sd["condition_embedder.time_embedder.linear_2.bias"],
        },
        "time_proj": {
            "kernel": _t(sd["condition_embedder.time_proj.weight"]),
            "bias": sd["condition_embedder.time_proj.bias"],
        },
        "text_fc1": {
            "kernel": _t(sd["condition_embedder.text_embedder.linear_1.weight"]),
            "bias": sd["condition_embedder.text_embedder.linear_1.bias"],
        },
        "text_fc2": {
            "kernel": _t(sd["condition_embedder.text_embedder.linear_2.weight"]),
            "bias": sd["condition_embedder.text_embedder.linear_2.bias"],
        },
        "head_scale_shift": sd["scale_shift_table"].reshape(1, 2, dim),
        "proj_out": {
            "kernel": _t(sd["proj_out.weight"]),
            "bias": sd["proj_out.bias"],
        },
    }
    for i in range(n_layers):
        b = f"blocks.{i}"
        params[f"block_{i}"] = {
            "scale_shift_table": sd[f"{b}.scale_shift_table"].reshape(1, 6, dim),
            "self_attn": _attn_tree(sd, f"{b}.attn1"),
            "cross_attn": _attn_tree(sd, f"{b}.attn2"),
            "norm2": {"scale": sd[f"{b}.norm2.weight"],
                      "bias": sd[f"{b}.norm2.bias"]},
            "ffn_in": {"kernel": _t(sd[f"{b}.ffn.net.0.proj.weight"]),
                       "bias": sd[f"{b}.ffn.net.0.proj.bias"]},
            "ffn_out": {"kernel": _t(sd[f"{b}.ffn.net.2.weight"]),
                        "bias": sd[f"{b}.ffn.net.2.bias"]},
        }
    if layer_mode == "scan":
        from .wan_dit import stack_block_params

        params = stack_block_params(params, n_layers)
    return params


def export_wan_state_dict(params: Dict, patch_size=(1, 2, 2),
                          in_channels: int = 16) -> Dict[str, np.ndarray]:
    """Inverse of convert_wan_state_dict (loop layout; validation/interop)."""
    dim = np.asarray(params["patch_embed"]["kernel"]).shape[1]
    pt, ph, pw_ = patch_size

    def t(x):
        return np.ascontiguousarray(np.asarray(x).T)

    def arr(x):
        return np.asarray(x)

    sd: Dict[str, np.ndarray] = {
        "patch_embedding.weight": t(params["patch_embed"]["kernel"]).reshape(
            dim, in_channels, pt, ph, pw_
        ),
        "patch_embedding.bias": arr(params["patch_embed"]["bias"]),
        "condition_embedder.time_embedder.linear_1.weight": t(
            _flip_sincos_rows(np.asarray(params["time_fc1"]["kernel"]))
        ),
        "condition_embedder.time_embedder.linear_1.bias": arr(params["time_fc1"]["bias"]),
        "condition_embedder.time_embedder.linear_2.weight": t(params["time_fc2"]["kernel"]),
        "condition_embedder.time_embedder.linear_2.bias": arr(params["time_fc2"]["bias"]),
        "condition_embedder.time_proj.weight": t(params["time_proj"]["kernel"]),
        "condition_embedder.time_proj.bias": arr(params["time_proj"]["bias"]),
        "condition_embedder.text_embedder.linear_1.weight": t(params["text_fc1"]["kernel"]),
        "condition_embedder.text_embedder.linear_1.bias": arr(params["text_fc1"]["bias"]),
        "condition_embedder.text_embedder.linear_2.weight": t(params["text_fc2"]["kernel"]),
        "condition_embedder.text_embedder.linear_2.bias": arr(params["text_fc2"]["bias"]),
        "scale_shift_table": arr(params["head_scale_shift"]).reshape(1, 2, dim),
        "proj_out.weight": t(params["proj_out"]["kernel"]),
        "proj_out.bias": arr(params["proj_out"]["bias"]),
    }
    i = 0
    while f"block_{i}" in params:
        blk = params[f"block_{i}"]
        b = f"blocks.{i}"
        for ours, theirs in (("self_attn", "attn1"), ("cross_attn", "attn2")):
            at = blk[ours]
            for pn, tn in (("q_proj", "to_q"), ("k_proj", "to_k"),
                           ("v_proj", "to_v"), ("o_proj", "to_out.0")):
                sd[f"{b}.{theirs}.{tn}.weight"] = t(at[pn]["kernel"])
                sd[f"{b}.{theirs}.{tn}.bias"] = arr(at[pn]["bias"])
            sd[f"{b}.{theirs}.norm_q.weight"] = arr(at["q_norm"]["scale"])
            sd[f"{b}.{theirs}.norm_k.weight"] = arr(at["k_norm"]["scale"])
        sd[f"{b}.scale_shift_table"] = arr(blk["scale_shift_table"]).reshape(1, 6, dim)
        sd[f"{b}.norm2.weight"] = arr(blk["norm2"]["scale"])
        sd[f"{b}.norm2.bias"] = arr(blk["norm2"]["bias"])
        sd[f"{b}.ffn.net.0.proj.weight"] = t(blk["ffn_in"]["kernel"])
        sd[f"{b}.ffn.net.0.proj.bias"] = arr(blk["ffn_in"]["bias"])
        sd[f"{b}.ffn.net.2.weight"] = t(blk["ffn_out"]["kernel"])
        sd[f"{b}.ffn.net.2.bias"] = arr(blk["ffn_out"]["bias"])
        i += 1
    return sd


def load_wan_safetensors(path: str, layer_mode: str = "scan",
                         strict: bool = True) -> Dict:
    """Load a diffusers Wan transformer checkpoint directory (or single
    .safetensors file) and convert to WanDiT params."""
    files = ([path] if path.endswith(".safetensors") else sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".safetensors")
    ))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    sd: Dict[str, np.ndarray] = {}
    for f in files:
        sd.update(_load_safetensors_any(f))
    return convert_wan_state_dict(sd, layer_mode=layer_mode, strict=strict)


def _load_safetensors_any(path: str) -> Dict[str, np.ndarray]:
    """Load one safetensors file to numpy, including bf16 tensors (numpy has
    no native bfloat16 — Wan checkpoints are bf16 — so those go through the
    torch loader and reinterpret as ml_dtypes.bfloat16)."""
    try:
        from safetensors.numpy import load_file

        return dict(load_file(path))
    except (TypeError, ValueError):
        import ml_dtypes
        import torch
        from safetensors.torch import load_file as load_torch

        out = {}
        for k, v in load_torch(path).items():
            if v.dtype == torch.bfloat16:
                out[k] = (v.view(torch.uint16).numpy()
                          .view(ml_dtypes.bfloat16))
            else:
                out[k] = v.numpy()
        return out
