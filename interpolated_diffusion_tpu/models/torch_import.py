"""Import reference PyTorch checkpoints into the TPU framework.

Converts torch ``state_dict``s of the reference models (KeypointDenoiser,
src/models/denoiser_keypoints.py:37; InterpLevelDenoiser,
src/models/denoiser_interp_levels.py:11, and its causal variant) into flax
param pytrees for the modules in models/denoisers.py — so a user of the
reference can bring their trained maze checkpoints along when switching.

Layout notes (torch → flax):
  - nn.Linear weight [out, in]            → Dense kernel [in, out] (transpose)
  - nn.Conv2d weight [out, in, kh, kw]    → nn.Conv kernel [kh, kw, in, out]
  - nn.MultiheadAttention in_proj_weight [3d, d] packs rows as [q; k; v] and
    splits each d into H×Dh head chunks — identical to our fused qkv Dense
    reshape [B,L,3,H,Dh], so a plain transpose suffices
  - nn.Embedding weight                   → Embed embedding (no transpose)
  - FiLM Linear(cond, 2d) chunks γ/β in halves on both sides (same order)

Everything here is host-side numpy; torch is only needed when reading a
.pt file directly (`load_reference_checkpoint`), not for conversion.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


Array = np.ndarray
Params = Dict[str, Any]


def _np(v) -> Array:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (possibly bf16) without importing torch at module scope
    try:
        return v.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(v)


def _linear(sd: Dict[str, Array], prefix: str) -> Params:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Dict[str, Array], prefix: str) -> Params:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _conv(sd: Dict[str, Array], prefix: str) -> Params:
    # [out, in, kh, kw] -> [kh, kw, in, out]
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _transformer(sd: Dict[str, Array], prefix: str, n_layers: int,
                 use_film: bool) -> Params:
    out: Params = {}
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}"
        block: Params = {
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "qkv": {
                "kernel": _np(sd[f"{p}.attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{p}.attn.in_proj_bias"]),
            },
            "attn_out": _linear(sd, f"{p}.attn.out_proj"),
            "ff1": _linear(sd, f"{p}.ff.0"),
            "ff2": _linear(sd, f"{p}.ff.2"),
        }
        if use_film and f"{p}.film1.weight" in sd:
            block["film1"] = _linear(sd, f"{p}.film1")
            block["film2"] = _linear(sd, f"{p}.film2")
        out[f"block_{i}"] = block
    return out


def _maze_condition_encoder(sd: Dict[str, Array], prefix: str) -> Optional[Params]:
    """cond_enc.maze.convs.{0,2,4..} + cond_enc.maze.fc (+ cond_enc.sg.mlp)."""
    conv_ids = sorted(
        int(k[len(f"{prefix}.maze.convs.") :].split(".")[0])
        for k in sd
        if k.startswith(f"{prefix}.maze.convs.") and k.endswith(".weight")
    )
    if not conv_ids:
        return None
    maze: Params = {
        f"conv_{n}": _conv(sd, f"{prefix}.maze.convs.{cid}")
        for n, cid in enumerate(conv_ids)
    }
    maze["fc"] = _linear(sd, f"{prefix}.maze.fc")
    out: Params = {"maze": maze}
    if f"{prefix}.sg.mlp.0.weight" in sd:
        out["sg"] = {
            "fc1": _linear(sd, f"{prefix}.sg.mlp.0"),
            "fc2": _linear(sd, f"{prefix}.sg.mlp.2"),
        }
    return out


def _n_layers(sd: Dict[str, Array], prefix: str) -> int:
    ids = {
        int(k[len(f"{prefix}.layers.") :].split(".")[0])
        for k in sd
        if k.startswith(f"{prefix}.layers.")
    }
    return max(ids) + 1 if ids else 0


def convert_keypoint_denoiser(sd: Dict[str, Array]) -> Params:
    """Reference KeypointDenoiser state_dict → flax params for
    models.denoisers.KeypointDenoiser."""
    params: Params = {
        "in_proj": _linear(sd, "in_proj"),
        "t_fc1": _linear(sd, "t_embed.0"),
        "t_fc2": _linear(sd, "t_embed.2"),
        "cond_proj": _linear(sd, "cond_proj"),
        "out": _linear(sd, "out"),
        "transformer": _transformer(sd, "transformer",
                                    _n_layers(sd, "transformer"), use_film=True),
    }
    enc = _maze_condition_encoder(sd, "cond_enc")
    if enc is not None:
        params["cond_enc"] = enc
    return params


def convert_interp_denoiser(sd: Dict[str, Array]) -> Params:
    """Reference InterpLevelDenoiser (or causal variant) state_dict → flax
    params for models.denoisers.InterpLevelDenoiser."""
    params: Params = {
        "in_proj": _linear(sd, "in_proj"),
        "level_emb": {"embedding": _np(sd["level_emb.weight"])},
        "lvl_fc1": _linear(sd, "level_proj.0"),
        "lvl_fc2": _linear(sd, "level_proj.2"),
        "cond_proj": _linear(sd, "cond_proj"),
        "out": _linear(sd, "out"),
        "transformer": _transformer(sd, "transformer",
                                    _n_layers(sd, "transformer"), use_film=True),
    }
    enc = _maze_condition_encoder(sd, "cond_enc")
    if enc is not None:
        params["cond_enc"] = enc
    return params


_CONVERTERS = {
    "keypoint": convert_keypoint_denoiser,
    "interp": convert_interp_denoiser,
    "interp_causal": convert_interp_denoiser,
}


def convert_state_dict(sd: Dict[str, Array], kind: str) -> Params:
    if kind not in _CONVERTERS:
        raise ValueError(f"unknown model kind {kind!r}; one of {sorted(_CONVERTERS)}")
    return _CONVERTERS[kind]({k: _np(v) for k, v in sd.items()})


def load_reference_checkpoint(
    path: str, kind: str, use_ema: bool = True
) -> Tuple[Params, Dict[str, Any]]:
    """Read a reference .pt checkpoint (payload {model, meta, ema?, ...},
    utils/checkpoint.py:6) and convert to flax params. Returns (params, meta).

    With use_ema, EMA shadow weights replace matching model entries (the
    reference's samplers prefer EMA weights, sample_generate.py:710-733).
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = dict(payload["model"] if isinstance(payload, dict) and "model" in payload
              else payload)
    meta = payload.get("meta", {}) if isinstance(payload, dict) else {}
    if use_ema and isinstance(payload, dict) and payload.get("ema"):
        _merge_ema_shadow(sd, payload["ema"], path)
    return convert_state_dict(sd, kind), meta


def _merge_ema_shadow(sd: Dict[str, Array], ema, path: str) -> None:
    """Overwrite sd entries with EMA shadow weights, in place.

    The reference stores the shadow as a LIST of tensors in
    `model.parameters()` order (src/utils/ema.py:9,:28). For these models
    (no buffers) that order equals state_dict key order, so we zip — with a
    per-tensor shape check that catches any order drift. A dict-form shadow
    (name-keyed) is also accepted.
    """
    shadow = ema.get("shadow", ema) if isinstance(ema, dict) else ema
    if isinstance(shadow, dict):
        for k, v in shadow.items():
            if k in sd:
                sd[k] = v
        return
    keys = list(sd.keys())
    if len(shadow) != len(keys):
        raise ValueError(
            f"{path}: EMA shadow has {len(shadow)} tensors but the model "
            f"state_dict has {len(keys)} — cannot align (pass use_ema=False "
            "to load the raw weights)")
    for k, t in zip(keys, shadow):
        if tuple(_np(sd[k]).shape) != tuple(_np(t).shape):
            raise ValueError(
                f"{path}: EMA shadow/state_dict order mismatch at {k!r} "
                f"({_np(sd[k]).shape} vs {_np(t).shape}); pass use_ema=False")
        sd[k] = t


def _ref_channels(meta: Dict[str, Any], key: str) -> Tuple[int, ...]:
    raw = meta.get(key, "32,64")
    if isinstance(raw, (list, tuple)):
        return tuple(int(c) for c in raw)
    return tuple(int(c) for c in str(raw).split(","))


def load_reference_denoiser(path: str, kind: str, bf16: bool = True,
                            use_ema: bool = True):
    """Load a reference .pt checkpoint into a ready-to-run flax model.

    kind: 'keypoint' | 'interp' | 'interp_causal'. Reads the reference meta
    dict (kp_* / s2_* prefixed hyperparameters, train_keypoints.py:564-601 /
    train_interp_levels.py:1181-1226), builds the matching flax module, and
    returns (model, params, meta) with meta normalized to this framework's
    key names so downstream meta-consumers work unchanged.
    """
    import jax.numpy as jnp

    from .denoisers import InterpLevelDenoiser, KeypointDenoiser

    params, meta = load_reference_checkpoint(path, kind, use_ema=use_ema)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if kind == "keypoint":
        if meta and meta.get("stage") not in (None, "keypoints"):
            raise ValueError(f"{path} is not a reference Stage-1 checkpoint")
        model = KeypointDenoiser(
            d_model=int(meta.get("kp_d_model", 256)),
            n_layers=int(meta.get("kp_n_layers", 8)),
            n_heads=int(meta.get("kp_n_heads", 8)),
            d_ff=int(meta.get("kp_d_ff", 1024)),
            d_cond=int(meta.get("kp_d_cond", 128)),
            use_sdf=bool(meta.get("use_sdf", False)),
            use_start_goal=bool(meta.get("cond_start_goal",
                                         meta.get("use_start_goal", True))),
            data_dim=int(meta.get("data_dim", 2)),
            kp_feat_dim=int(meta.get("kp_feat_dim", 0)),
            maze_channels=_ref_channels(meta, "kp_maze_channels"),
            dtype=dtype,
        )
        norm = dict(meta)
        for ours, ref in [("d_model", "kp_d_model"), ("n_layers", "kp_n_layers"),
                          ("n_heads", "kp_n_heads"), ("d_ff", "kp_d_ff"),
                          ("d_cond", "kp_d_cond")]:
            # only map when the reference key exists — planting explicit None
            # would defeat downstream `.get(key, default)` fallbacks
            if ours not in norm and meta.get(ref) is not None:
                norm[ours] = meta[ref]
        norm.setdefault("maze_channels",
                        ",".join(str(c) for c in _ref_channels(meta, "kp_maze_channels")))
        norm.setdefault("use_kp_feat", int(meta.get("kp_feat_dim", 0)) > 0)
        return model, params, norm
    if kind in ("interp", "interp_causal"):
        stage = meta.get("stage") if meta else None
        if stage not in (None, "interp_levels", "interp_levels_causal"):
            raise ValueError(f"{path} is not a reference Stage-2 checkpoint")
        # the causal trainer stamps its own stage (train_interp_levels_causal
        # .py:971) — honor it regardless of the requested kind
        if stage == "interp_levels_causal":
            kind = "interp_causal"
        model = InterpLevelDenoiser(
            d_model=int(meta.get("s2_d_model", 256)),
            n_layers=int(meta.get("s2_n_layers", 8)),
            n_heads=int(meta.get("s2_n_heads", 8)),
            d_ff=int(meta.get("s2_d_ff", 1024)),
            d_cond=int(meta.get("s2_d_cond", 128)),
            use_sdf=bool(meta.get("use_sdf", False)),
            use_start_goal=bool(meta.get("cond_start_goal",
                                         meta.get("use_start_goal", True))),
            data_dim=int(meta.get("data_dim", 2)),
            max_levels=max(8, int(meta.get("levels", 3))),
            mask_channels=int(meta.get("mask_channels", 1)),
            maze_channels=_ref_channels(meta, "s2_maze_channels"),
            causal=kind == "interp_causal",
            dtype=dtype,
        )
        norm = dict(meta)
        for ours, ref in [("d_model", "s2_d_model"), ("n_layers", "s2_n_layers"),
                          ("n_heads", "s2_n_heads"), ("d_ff", "s2_d_ff"),
                          ("d_cond", "s2_d_cond"),
                          # reference records the adj/x0 target mode as
                          # "stage2_mode" (train_interp_levels.py:1192);
                          # native meta + sample/generate.py read "mode"
                          ("mode", "stage2_mode")]:
            # only map when the reference key exists — planting explicit None
            # would defeat downstream `.get(key, default)` fallbacks (e.g.
            # sample/generate.py's il_meta.get("mode", "adj"))
            if ours not in norm and meta.get(ref) is not None:
                norm[ours] = meta[ref]
        norm.setdefault("maze_channels",
                        ",".join(str(c) for c in _ref_channels(meta, "s2_maze_channels")))
        norm.setdefault("causal", int(kind == "interp_causal"))
        return model, params, norm
    raise ValueError(f"unknown kind {kind!r}")


def _mlp2(sd: Dict[str, Array], prefix: str) -> Tuple[Params, Params]:
    """nn.Sequential(Linear, SiLU, Linear) → (fc1, fc2)."""
    return _linear(sd, f"{prefix}.0"), _linear(sd, f"{prefix}.2")


def _cross_attn(sd: Dict[str, Array], prefix: str, n_heads: int) -> Params:
    """torch nn.MultiheadAttention (cross) → flax MultiHeadDotProductAttention.

    in_proj_weight [3d, d] rows pack [Wq; Wk; Wv]; flax keeps separate
    query/key/value Denses with kernels [d, H, Dh] and an out Dense [H, Dh, d].
    """
    w = _np(sd[f"{prefix}.in_proj_weight"])
    b = _np(sd[f"{prefix}.in_proj_bias"])
    d = w.shape[1]
    dh = d // n_heads
    def qkv_part(i):
        kern = w[i * d:(i + 1) * d].T.reshape(d, n_heads, dh)
        bias = b[i * d:(i + 1) * d].reshape(n_heads, dh)
        return {"kernel": kern, "bias": bias}
    out_w = _np(sd[f"{prefix}.out_proj.weight"])  # [d, d]
    return {
        "query": qkv_part(0),
        "key": qkv_part(1),
        "value": qkv_part(2),
        "out": {"kernel": out_w.T.reshape(n_heads, dh, d),
                "bias": _np(sd[f"{prefix}.out_proj.bias"])},
    }


def convert_keypoint_selector(sd: Dict[str, Array], n_heads: int = 8) -> Params:
    """Reference KeypointSelector state_dict (keypoint_selector.py:40) → flax
    params for models.selector.KeypointSelector."""
    params: Params = {}
    conv_ids = sorted(
        int(k[len("spatial_conv."):].split(".")[0])
        for k in sd if k.startswith("spatial_conv.") and k.endswith(".weight")
    )
    for n, cid in enumerate(conv_ids):
        params[f"conv_{n}"] = _conv(sd, f"spatial_conv.{cid}")
    if "spatial_proj.weight" in sd:  # 1x1 Conv2d (absent when c_in == d_model)
        params["proj"] = _conv(sd, "spatial_proj")
    if "sg_token.0.weight" in sd:
        params["sg_fc1"], params["sg_fc2"] = _mlp2(sd, "sg_token")
    if "goal_dist_token.0.weight" in sd:
        params["gd_fc1"], params["gd_fc2"] = _mlp2(sd, "goal_dist_token")
    params["time_proj"] = _linear(sd, "time_proj")
    if "level_mlp.0.weight" in sd:
        params["lvl_fc1"], params["lvl_fc2"] = _mlp2(sd, "level_mlp")
    if "cond_bias.0.weight" in sd:
        params["bias_fc1"], params["bias_fc2"] = _mlp2(sd, "cond_bias")
    enc = _maze_condition_encoder(sd, "cond_enc")
    if enc is not None:
        params["cond_enc"] = enc
    block_ids = sorted({
        int(k[len("blocks."):].split(".")[0]) for k in sd if k.startswith("blocks.")
    })
    for i in block_ids:
        p = f"blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "attn": _cross_attn(sd, f"{p}.attn", n_heads),
            "ff1": _linear(sd, f"{p}.ff.0"),
            "ff2": _linear(sd, f"{p}.ff.2"),
        }
    params["out"] = _linear(sd, "out")
    return params


def convert_segment_cost(sd: Dict[str, Array]) -> Params:
    """Reference SegmentCostPredictor (D_phi) state_dict → flax params for
    models.selector.SegmentCostPredictor."""
    params: Params = {"cond_enc": _maze_condition_encoder(sd, "cond_enc")}
    lin_ids = sorted(
        int(k[len("mlp."):].split(".")[0])
        for k in sd if k.startswith("mlp.") and k.endswith(".weight")
    )
    for n, lid in enumerate(lin_ids[:-1]):
        params[f"fc_{n}"] = _linear(sd, f"mlp.{lid}")
    params["out"] = _linear(sd, f"mlp.{lin_ids[-1]}")
    return params


_CONVERTERS["selector"] = convert_keypoint_selector
_CONVERTERS["segment_cost"] = convert_segment_cost


def load_reference_selector(path: str, bf16: bool = True, use_ema: bool = True):
    """Reference selector .pt → (flax KeypointSelector, params, meta).
    Selector meta keys already match this framework's names
    (train_keypoint_selector.py meta dict)."""
    import jax.numpy as jnp

    from .selector import KeypointSelector

    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = dict(payload["model"] if isinstance(payload, dict) and "model" in payload
              else payload)
    meta = payload.get("meta", {}) if isinstance(payload, dict) else {}
    if meta and meta.get("stage") not in (None, "selector"):
        raise ValueError(f"{path} is not a reference selector checkpoint")
    if use_ema and isinstance(payload, dict) and payload.get("ema"):
        _merge_ema_shadow(sd, payload["ema"], path)
    n_heads = int(meta.get("n_heads", 8))
    params = convert_keypoint_selector({k: _np(v) for k, v in sd.items()},
                                       n_heads=n_heads)
    model = KeypointSelector(
        T=int(meta.get("T", 64)), d_model=int(meta.get("d_model", 256)),
        n_heads=n_heads, d_ff=int(meta.get("d_ff", 512)),
        n_layers=int(meta.get("n_layers", 2)), pos_dim=int(meta.get("pos_dim", 64)),
        use_sdf=bool(meta.get("use_sdf", False)),
        use_start_goal=bool(meta.get("cond_start_goal", True)),
        use_sg_map=bool(meta.get("use_sg_map", True)),
        use_sg_token=bool(meta.get("use_sg_token", True)),
        use_goal_dist_token=bool(meta.get("use_goal_dist_token", False)),
        use_cond_bias=bool(meta.get("use_cond_bias", False)),
        cond_bias_mode=str(meta.get("cond_bias_mode", "memory")),
        use_level=bool(meta.get("use_level", False)),
        sg_map_sigma=float(meta.get("sg_map_sigma", 1.5)),
        maze_channels=_ref_channels(meta, "maze_channels"),
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    return model, params, dict(meta)


def load_reference_segment_cost(path: str, bf16: bool = True, use_ema: bool = True):
    """Reference D_phi .pt → (flax SegmentCostPredictor, params, meta)."""
    import jax.numpy as jnp

    from .selector import SegmentCostPredictor

    params, meta = load_reference_checkpoint(path, "segment_cost", use_ema=use_ema)
    if meta and meta.get("stage") not in (None, "segment_cost"):
        raise ValueError(f"{path} is not a reference segment_cost checkpoint")
    model = SegmentCostPredictor(
        d_cond=int(meta.get("d_cond", 128)),
        seg_feat_dim=int(meta.get("seg_feat_dim", 3)),
        hidden_dim=int(meta.get("hidden_dim", 256)),
        n_layers=int(meta.get("n_layers", 3)),
        use_sdf=bool(meta.get("use_sdf", False)),
        use_start_goal=bool(meta.get("cond_start_goal", True)),
        maze_channels=_ref_channels(meta, "maze_channels"),
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    return model, params, dict(meta)


def _video_cond_encoder(sd: Dict[str, Array]) -> Params:
    """Video denoisers take either a TextConditionEncoder (cond_enc.proj.0/2,
    encoders.py:74 — mapped to our text_enc.fc1/fc2) or the maze encoder."""
    if "cond_enc.proj.0.weight" in sd:
        return {"text_enc": {"fc1": _linear(sd, "cond_enc.proj.0"),
                             "fc2": _linear(sd, "cond_enc.proj.2")}}
    enc = _maze_condition_encoder(sd, "cond_enc")
    return {"cond_enc": enc} if enc is not None else {}


def convert_video_keypoint_denoiser(sd: Dict[str, Array]) -> Params:
    """Reference VideoTokenKeypointDenoiser (video_token_denoisers.py:56) →
    flax params for models.video_denoisers.VideoTokenKeypointDenoiser."""
    params: Params = {
        "in_proj": _linear(sd, "in_proj"),
        "t_fc1": _linear(sd, "t_embed.0"),
        "t_fc2": _linear(sd, "t_embed.2"),
        "cond_proj": _linear(sd, "cond_proj"),
        "out": _linear(sd, "out"),
        "transformer": _transformer(sd, "transformer",
                                    _n_layers(sd, "transformer"), use_film=True),
    }
    params.update(_video_cond_encoder(sd))
    return params


def convert_video_interp_denoiser(sd: Dict[str, Array]) -> Params:
    """Reference VideoTokenInterpLevelDenoiser (video_token_denoisers.py:129) →
    flax params for models.video_denoisers.VideoTokenInterpLevelDenoiser."""
    params: Params = {
        "in_proj": _linear(sd, "in_proj"),
        "level_emb": {"embedding": _np(sd["level_emb.weight"])},
        "lvl_fc1": _linear(sd, "level_proj.0"),
        "lvl_fc2": _linear(sd, "level_proj.2"),
        "cond_proj": _linear(sd, "cond_proj"),
        "out": _linear(sd, "out"),
        "transformer": _transformer(sd, "transformer",
                                    _n_layers(sd, "transformer"), use_film=True),
    }
    params.update(_video_cond_encoder(sd))
    return params


_CONVERTERS["video_keypoint"] = convert_video_keypoint_denoiser
_CONVERTERS["video_interp"] = convert_video_interp_denoiser


def convert_tiny_temporal_interpolator(sd: Dict[str, Array]) -> Params:
    """Reference TinyTemporalInterpolator (video_interpolator.py:8) → flax
    params. torch depthwise Conv1d weight [D, 1, K] → flax Conv kernel
    [K, in/groups=1, D].

    Scope note: the conv-refiner interpolators (LatentLerpResidual with
    LatentResidualRefiner, LatentFlowInterpolator's UNet, the straightener
    convs) are intentionally REDESIGNED on this side (MLP-over-features /
    different layouts, see models/interpolators.py), so their weights do not
    transfer — retrain those; the training costs minutes (docs/RESULTS.md).
    """
    conv_ids = sorted(
        int(k[len("net."):].split(".")[0])
        for k in sd if k.startswith("net.") and k.endswith(".weight")
    )
    return {
        f"dwconv_{n}": {
            "kernel": _np(sd[f"net.{cid}.weight"]).transpose(2, 1, 0),
            "bias": _np(sd[f"net.{cid}.bias"]),
        }
        for n, cid in enumerate(conv_ids)
    }


_CONVERTERS["tiny_interpolator"] = convert_tiny_temporal_interpolator
