"""Model reconstruction from checkpoint meta — the cross-stage config channel.

Mirrors the reference pattern where samplers/downstream trainers rebuild
models from the `meta` dict persisted in checkpoints (§5.4): each loader
resolves a checkpoint directory (or run dir containing ckpt_N subdirs),
rebuilds the module from meta, and returns (module, params, meta), preferring
EMA weights when present.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.checkpoint import latest_checkpoint, load_checkpoint, read_meta
from .denoisers import InterpLevelDenoiser, KeypointDenoiser
from .selector import KeypointSelector, SegmentCostPredictor


def _is_torch_ckpt(path: str) -> bool:
    return os.path.isfile(path) and path.endswith((".pt", ".pth"))


def _on_device(params):
    """Pin loaded params on the default device ONCE.

    flax serialization.from_bytes returns host numpy arrays; passing those
    into a jitted pipeline re-uploads every weight on EVERY dispatch. On a
    tunneled TPU (~30 MB/s host→device) that cost ~6 s/request and was the
    round-2 serving gap (bench_serving p50 8.4 s vs a 14 ms compute). A
    committed jax.Array transfers once and is reused by all later calls."""
    return jax.device_put(params)


def resolve_ckpt(path: str) -> str:
    if os.path.exists(os.path.join(path, "meta.json")):
        return path
    found = latest_checkpoint(path)
    if not found:
        raise FileNotFoundError(f"no checkpoint found under {path}")
    return found


def _maze_ch(meta) -> Tuple[int, ...]:
    return tuple(int(c) for c in str(meta["maze_channels"]).split(","))


def _cond_template(meta) -> dict:
    cond = {"occ": jnp.zeros((1, 1, meta["maze_h"], meta["maze_w"])),
            "start_goal": jnp.zeros((1, 4))}
    if meta.get("use_sdf"):
        cond["sdf"] = jnp.zeros((1, 1, meta["maze_h"], meta["maze_w"]))
    return cond


def load_keypoint_model(path: str, bf16: bool = True, use_ema: bool = True):
    if _is_torch_ckpt(path):
        # a reference PyTorch checkpoint: convert weights + meta on the fly
        from .torch_import import load_reference_denoiser

        model, params, meta = load_reference_denoiser(
            path, "keypoint", bf16=bf16, use_ema=use_ema)
        return model, _on_device(params), meta
    path = resolve_ckpt(path)
    _, meta = read_meta(path)
    if meta.get("stage") != "keypoints":
        raise ValueError(f"{path} is not a Stage-1 checkpoint")
    data_dim = int(meta["data_dim"])
    model = KeypointDenoiser(
        d_model=meta["d_model"], n_layers=meta["n_layers"], n_heads=meta["n_heads"],
        d_ff=meta["d_ff"], d_cond=meta["d_cond"],
        use_sdf=bool(meta["use_sdf"]), use_start_goal=bool(meta["cond_start_goal"]),
        data_dim=data_dim,
        kp_feat_dim=meta.get("kp_feat_dim", 0) if meta.get("use_kp_feat") else 0,
        maze_channels=_maze_ch(meta),
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    K, T = int(meta["K"]), int(meta["T"])
    tmpl = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, K, data_dim)), jnp.zeros((1,), dtype=jnp.int32),
        jnp.zeros((1, K), dtype=jnp.int32), jnp.zeros((1, K, data_dim), dtype=bool),
        _cond_template(meta),
        T,
    )["params"]
    _, payload = load_checkpoint(path, tmpl)
    params = payload.get("ema") if (use_ema and "ema" in payload) else payload["params"]
    return model, _on_device(params), meta


def load_interp_model(path: str, bf16: bool = True, use_ema: bool = True):
    if _is_torch_ckpt(path):
        # load_reference_denoiser upgrades kind to interp_causal itself when
        # the checkpoint's stage is "interp_levels_causal"
        from .torch_import import load_reference_denoiser

        model, params, meta = load_reference_denoiser(
            path, "interp", bf16=bf16, use_ema=use_ema)
        return model, _on_device(params), meta
    path = resolve_ckpt(path)
    _, meta = read_meta(path)
    if meta.get("stage") != "interp_levels":
        raise ValueError(f"{path} is not a Stage-2 checkpoint")
    data_dim = int(meta["data_dim"])
    model = InterpLevelDenoiser(
        d_model=meta["d_model"], n_layers=meta["n_layers"], n_heads=meta["n_heads"],
        d_ff=meta["d_ff"], d_cond=meta["d_cond"],
        use_sdf=bool(meta["use_sdf"]), use_start_goal=bool(meta["cond_start_goal"]),
        data_dim=data_dim, max_levels=max(8, int(meta["levels"])),
        mask_channels=int(meta["mask_channels"]),
        maze_channels=_maze_ch(meta),
        causal=bool(meta.get("causal", 0)),
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    T = int(meta["T"])
    mc = int(meta["mask_channels"])
    tmpl = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, T, data_dim)), jnp.zeros((1,), dtype=jnp.int32),
        jnp.zeros((1, T, mc)) if mc > 1 else jnp.zeros((1, T), dtype=bool),
        _cond_template(meta),
    )["params"]
    _, payload = load_checkpoint(path, tmpl)
    params = payload.get("ema") if (use_ema and "ema" in payload) else payload["params"]
    return model, _on_device(params), meta


def load_selector_model(path: str, bf16: bool = True):
    if _is_torch_ckpt(path):
        from .torch_import import load_reference_selector

        model, params, meta = load_reference_selector(path, bf16=bf16)
        return model, _on_device(params), meta
    path = resolve_ckpt(path)
    _, meta = read_meta(path)
    if meta.get("stage") != "selector":
        raise ValueError(f"{path} is not a selector checkpoint")
    model = KeypointSelector(
        T=int(meta["T"]), d_model=meta["d_model"], n_heads=meta["n_heads"],
        d_ff=meta["d_ff"], n_layers=meta["n_layers"], pos_dim=meta["pos_dim"],
        use_sdf=bool(meta["use_sdf"]), use_start_goal=bool(meta["cond_start_goal"]),
        use_sg_map=bool(meta["use_sg_map"]), use_sg_token=bool(meta["use_sg_token"]),
        use_goal_dist_token=bool(meta["use_goal_dist_token"]),
        use_cond_bias=bool(meta["use_cond_bias"]),
        cond_bias_mode=meta["cond_bias_mode"],
        use_level=bool(meta["use_level"]), sg_map_sigma=float(meta["sg_map_sigma"]),
        maze_channels=_maze_ch(meta),
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    cond = _cond_template(meta)
    if meta.get("use_level"):
        cond["level"] = jnp.zeros((1, 1))
    tmpl = model.init(jax.random.PRNGKey(0), cond)["params"]
    _, payload = load_checkpoint(path, tmpl)
    return model, _on_device(payload["params"]), meta


def load_segment_cost_model(path: str, bf16: bool = True):
    if _is_torch_ckpt(path):
        from .torch_import import load_reference_segment_cost

        model, params, meta = load_reference_segment_cost(path, bf16=bf16)
        return model, _on_device(params), meta
    path = resolve_ckpt(path)
    _, meta = read_meta(path)
    if meta.get("stage") != "segment_cost":
        raise ValueError(f"{path} is not a segment-cost checkpoint")
    model = SegmentCostPredictor(
        d_cond=meta["d_cond"], seg_feat_dim=meta["seg_feat_dim"],
        hidden_dim=meta["hidden_dim"], n_layers=meta["n_layers"],
        use_sdf=bool(meta["use_sdf"]), use_start_goal=bool(meta["cond_start_goal"]),
        maze_channels=_maze_ch(meta),
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    tmpl = model.init(
        jax.random.PRNGKey(0), _cond_template(meta),
        jnp.zeros((1, meta["seg_feat_dim"])),
    )["params"]
    _, payload = load_checkpoint(path, tmpl)
    return model, _on_device(payload["params"]), meta


def make_dphi_seg_cost_fn(path: str, T: int, use_sdf: bool | None = None,
                          bf16: bool = True):
    """Load D_phi and return (seg_cost_fn, meta): seg_cost_fn(cond, idx) ->
    [B, K-1] predicted costs of the consecutive segments of `idx` [B, K].

    Jit-friendly (params close over as constants — D_phi is tiny); used for
    the kp_feat cost channels (reference train_keypoints.py:515-526 /
    sample_generate.py:510-547) with the same meta validation (T and use_sdf
    must match the checkpoint)."""
    from ..ops.selection import build_segment_features_from_idx

    model, params, meta = load_segment_cost_model(path, bf16)
    if meta.get("T") is not None and int(meta["T"]) != int(T):
        raise ValueError(f"dphi_ckpt T mismatch: ckpt={meta['T']} args={T}")
    if use_sdf is not None and meta.get("use_sdf") is not None \
            and bool(meta["use_sdf"]) != bool(use_sdf):
        raise ValueError("dphi_ckpt use_sdf mismatch")
    seg_feat_dim = int(meta.get("seg_feat_dim", 3))

    def seg_cost_fn(cond, idx):
        seg_feat = build_segment_features_from_idx(idx, T, seg_feat_dim)
        return model.apply({"params": params}, cond, seg_feat)

    return seg_cost_fn, meta
