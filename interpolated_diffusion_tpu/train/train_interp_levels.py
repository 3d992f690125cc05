"""Stage-2 interp-level denoiser trainer (maze family).

Capability parity with reference src/train/train_interp_levels.py: nested
mask policies (random_nested / uniform / dp-from-base), level sampling
(uniform / high-biased), `adj` (target = x_{s−1} − x_s) and `x0`
(target = x0 − x_s) modes, anchor-confidence channels with per-level anneal,
interp corruption (distance-scaled noise, anchor jitter), conf-weighted MSE.
The causal variant (train_interp_levels_causal.py) is the same trainer with
--causal 1.

Stage-1 bootstrap scheduled sampling (replace GT anchors with DDIM-sampled
student anchors w.p. warmup-scheduled p) plugs in via --bootstrap_ckpt.
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.denoisers import InterpLevelDenoiser, KeypointDenoiser
from ..ops.ddpm import ddim_scan, make_timesteps
from ..ops.keyframes import build_nested_masks_from_base, build_nested_masks_batch
from ..ops.normalize import logit_pos, sigmoid_pos
from ..ops.schedules import make_schedule
from ..parallel.mesh import (
    make_mesh_for_batch,
    replicate,
    shard_batch,
    shard_superbatch,
)
from ..utils.checkpoint import latest_checkpoint, load_checkpoint, read_meta, save_checkpoint
from .batches import (
    build_interp_adjacent_batch,
    build_interp_level_batch,
    build_known_mask_values,
    gather_keypoints,
)
from .common import add_data_args, add_train_args, make_dataset, make_loader, sample_idx_policy
from .state import (
    init_train_state,
    make_optimizer,
    make_train_multi_step,
    make_train_step,
    stack_batches,
)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_interp_levels (Stage-2, TPU)")
    p.add_argument("--T", type=int, default=64)
    p.add_argument("--K_min", type=int, default=8)
    p.add_argument("--levels", type=int, default=3)
    p.add_argument("--k_schedule", type=str, default="doubling", choices=["doubling", "linear", "geom"])
    p.add_argument("--mode", type=str, default="adj", choices=["adj", "x0"])
    p.add_argument("--causal", type=int, default=0)
    p.add_argument("--mask_policy", type=str, default="random_nested",
                   choices=["random_nested", "uniform", "dp", "selector", "selector_level"])
    p.add_argument("--selector_ckpt", type=str, default=None)
    p.add_argument("--mask_policy_mix", type=str, default="",
                   help='weighted policy mix like "uniform:0.5,random:0.3,'
                        'selector:0.2" (reference train_interp_levels.py:50,'
                        ':890-892); overrides --mask_policy. Sampled '
                        'per-SAMPLE here (the reference samples one policy '
                        'per step — same marginal distribution)')
    p.add_argument("--level_sampling", type=str, default="high", choices=["uniform", "high"])
    p.add_argument("--level_high_prob", type=float, default=0.5)
    p.add_argument("--d_model", type=int, default=384)
    p.add_argument("--n_layers", type=int, default=12)
    p.add_argument("--n_heads", type=int, default=12)
    p.add_argument("--d_ff", type=int, default=1536)
    p.add_argument("--d_cond", type=int, default=128)
    p.add_argument("--maze_channels", type=str, default="32,64,128,128")
    p.add_argument("--clamp_endpoints", type=int, default=1)
    p.add_argument("--cond_start_goal", type=int, default=1)
    p.add_argument("--recompute_vel", type=int, default=1)
    # anchor confidence channel
    p.add_argument("--anchor_conf", type=int, default=0)
    p.add_argument("--anchor_conf_teacher", type=float, default=0.95)
    p.add_argument("--anchor_conf_student", type=float, default=0.5)
    p.add_argument("--anchor_conf_endpoints", type=float, default=1.0)
    p.add_argument("--anchor_conf_missing", type=float, default=0.0)
    p.add_argument("--anchor_conf_anneal", type=int, default=0)
    p.add_argument("--anchor_conf_anneal_mode", type=str, default="linear",
                   choices=["none", "linear", "cosine"])
    # loss weights
    p.add_argument("--w_anchor", type=float, default=1.0)
    p.add_argument("--w_missing", type=float, default=1.0)
    # corruption
    p.add_argument("--corrupt_mode", type=str, default="none", choices=["none", "dist", "gauss"])
    p.add_argument("--corrupt_sigma_max", type=float, default=0.0)
    p.add_argument("--corrupt_sigma_min", type=float, default=0.0)
    p.add_argument("--corrupt_sigma_pow", type=float, default=1.0)
    p.add_argument("--corrupt_anchor_frac", type=float, default=0.0)
    p.add_argument("--smooth_weight", type=float, default=0.0,
                   help=">0: add a curvature-weighted error term "
                        "w*mean(Δ²(delta_hat - target)²) — suppresses the "
                        "high-frequency delta texture the accel metric "
                        "amplifies (docs/RESULTS.md round-5)")
    p.add_argument("--corrupt_index_jitter_max", type=int, default=0)
    p.add_argument("--corrupt_index_jitter_prob", type=float, default=0.0)
    p.add_argument("--corrupt_index_jitter_pow", type=float, default=1.0)
    p.add_argument("--pos_clip", type=int, default=0)
    p.add_argument("--pos_clip_min", type=float, default=0.0)
    p.add_argument("--pos_clip_max", type=float, default=1.0)
    p.add_argument("--corrupt_vel", type=int, default=0,
                   help="1: recompute velocity channels from the iid-noised "
                        "positions (reference behavior — injects σ·√2·T "
                        "unlearnable noise into D=4 targets); 0 (default): "
                        "velocities read the pre-noise segment-smooth "
                        "positions, matching what sampling-time inputs look "
                        "like")
    p.add_argument("--clean_target", type=int, default=1,
                   help="1 (default): adj-mode target level x_{s-1} is the "
                        "clean interpolation (same expectation, far lower "
                        "target variance); 0: independent corruption draw on "
                        "the target too (reference :328-374 behavior)")
    # Stage-1 bootstrap scheduled sampling
    p.add_argument("--bootstrap_ckpt", type=str, default=None)
    p.add_argument("--dphi_ckpt", type=str, default=None,
                   help="segment-cost ckpt for the bootstrap sampler's "
                        "kp_feat cost channels (when the Stage-1 ckpt was "
                        "trained with kp_feat_dphi)")
    p.add_argument("--bootstrap_replace_prob", type=float, default=0.5)
    p.add_argument("--bootstrap_warmup_steps", type=int, default=2000)
    p.add_argument("--bootstrap_ddim_steps", type=int, default=5)
    p.add_argument("--bootstrap_solver", type=str, default="ddim",
                   choices=["ddim", "pfdiff", "dpm"],
                   help="pfdiff/dpm: fewer or better-spent bootstrap "
                        "sampler model evals per scheduled-sampling batch")
    p.add_argument("--bootstrap_best_of", type=int, default=1,
                   help=">1: draw N candidate student anchor sets per batch "
                        "and keep the best (mode below) — trains Stage-2 on "
                        "the anchor distribution the best-of sampler serves "
                        "(sample/generate.py --stage1_best_of)")
    p.add_argument("--bootstrap_best_of_mode", type=str, default="dp",
                   choices=["dp", "collision"],
                   help="dp: chain-DP per-anchor candidate mix; collision: "
                        "whole-set lowest interpolation collision")
    p.add_argument("--bootstrap_x0_clip", type=float, default=4.0,
                   help=">0: clamp the bootstrap DDIM's per-step x0 estimate "
                        "to ±this across ALL dims (ops/ddpm.ddim_step) — "
                        "bounds velocity dims that pos_clip cannot reach; "
                        "ignored in logit space")
    add_data_args(p)
    add_train_args(p)
    return p


def mask_channels_for(args) -> int:
    base = 2 if args.mode == "adj" else 1
    return base + (1 if args.anchor_conf else 0)


def make_meta(args, data_dim: int) -> Dict:
    return {
        "stage": "interp_levels",
        "T": args.T,
        "K_min": args.K_min,
        "levels": args.levels,
        "k_schedule": args.k_schedule,
        "mode": args.mode,
        "causal": args.causal,
        "d_model": args.d_model,
        "n_layers": args.n_layers,
        "n_heads": args.n_heads,
        "d_ff": args.d_ff,
        "d_cond": args.d_cond,
        "maze_channels": args.maze_channels,
        "mask_channels": mask_channels_for(args),
        "anchor_conf": args.anchor_conf,
        "anchor_conf_anneal": args.anchor_conf_anneal,
        "anchor_conf_anneal_mode": args.anchor_conf_anneal_mode,
        "clamp_endpoints": args.clamp_endpoints,
        "cond_start_goal": args.cond_start_goal,
        "with_velocity": args.with_velocity,
        "use_sdf": args.use_sdf,
        "recompute_vel": args.recompute_vel,
        "data_dim": data_dim,
        "maze_h": args.maze_h,
        "maze_w": args.maze_w,
        "corrupt_mode": args.corrupt_mode,
        "corrupt_vel": args.corrupt_vel,
        "clean_target": args.clean_target,
        "mask_policy": args.mask_policy,
        "mask_policy_mix": args.mask_policy_mix,
        "bootstrap_best_of": getattr(args, "bootstrap_best_of", 1),
        "bootstrap_best_of_mode": getattr(args, "bootstrap_best_of_mode", "dp"),
    }


def build_model(args, data_dim: int) -> InterpLevelDenoiser:
    return InterpLevelDenoiser(
        d_model=args.d_model,
        n_layers=args.n_layers,
        n_heads=args.n_heads,
        d_ff=args.d_ff,
        d_cond=args.d_cond,
        use_sdf=bool(args.use_sdf),
        use_start_goal=bool(args.cond_start_goal),
        data_dim=data_dim,
        max_levels=max(8, args.levels),
        mask_channels=mask_channels_for(args),
        maze_channels=tuple(int(c) for c in args.maze_channels.split(",")),
        causal=bool(args.causal),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )


def build_anchor_conf(
    mask_s: jnp.ndarray,
    student_mask: Optional[jnp.ndarray],
    conf_teacher: float,
    conf_student: float,
    conf_endpoints: float,
    conf_missing: float,
    clamp_endpoints: bool,
) -> jnp.ndarray:
    """Per-frame anchor confidence (reference _build_anchor_conf :546)."""
    conf = jnp.where(mask_s, conf_teacher, conf_missing).astype(jnp.float32)
    if student_mask is not None:
        conf = jnp.where(student_mask & mask_s, conf_student, conf)
    if clamp_endpoints:
        conf = conf.at[:, 0].set(conf_endpoints).at[:, -1].set(conf_endpoints)
    return conf


def anneal_conf(conf: jnp.ndarray, s_idx: jnp.ndarray, levels: int, mode: str) -> jnp.ndarray:
    """conf += (1 − conf)·λ(s) with λ linear/cosine in s/levels (:565)."""
    if mode == "none" or levels <= 0:
        return conf
    frac = s_idx.astype(jnp.float32) / float(levels)
    if mode == "linear":
        lam = 1.0 - frac
    elif mode == "cosine":
        lam = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
    else:
        lam = jnp.zeros_like(frac)
    return conf + (1.0 - conf) * lam[:, None]


def sample_level_indices(
    key: jax.Array, B: int, levels: int, mode: str, high_prob: float
) -> jnp.ndarray:
    """s ~ uniform{1..levels}, or biased toward s=levels w.p. high_prob."""
    k1, k2 = jax.random.split(key)
    s_uni = jax.random.randint(k1, (B,), 1, levels + 1)
    if mode == "uniform" or levels <= 1:
        return s_uni
    high = jax.random.uniform(k2, (B,)) < float(np.clip(high_prob, 0.0, 1.0))
    return jnp.where(high, levels, s_uni)


def make_bootstrap_sampler(args, data_dim: int):
    """Load the Stage-1 ckpt (via meta) and return a jittable DDIM anchor
    sampler: (params, key, idx, cond) -> z_pred [B, K, D] in data space.

    Mirrors reference _sample_keypoints_ddim (train_interp_levels.py:200):
    few-step DDIM with quadratic time spacing and known-endpoint re-clamping.
    """
    path = args.bootstrap_ckpt
    if os.path.isdir(os.path.join(path, "..")) and not os.path.exists(
        os.path.join(path, "meta.json")
    ):
        path = latest_checkpoint(path) or path
    _, meta = read_meta(path)
    if meta.get("stage") != "keypoints":
        raise ValueError(f"bootstrap ckpt {path} is not a keypoints checkpoint")
    kp_model = KeypointDenoiser(
        d_model=meta["d_model"],
        n_layers=meta["n_layers"],
        n_heads=meta["n_heads"],
        d_ff=meta["d_ff"],
        d_cond=meta["d_cond"],
        use_sdf=bool(meta["use_sdf"]),
        use_start_goal=bool(meta["cond_start_goal"]),
        data_dim=data_dim,
        kp_feat_dim=meta.get("kp_feat_dim", 0) if meta.get("use_kp_feat") else 0,
        maze_channels=tuple(int(c) for c in meta["maze_channels"].split(",")),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    K = int(meta["K"])
    k_init = jax.random.PRNGKey(0)
    cond0 = {"occ": jnp.zeros((1, 1, args.maze_h, args.maze_w)),
             "start_goal": jnp.zeros((1, 4))}
    if meta.get("use_sdf"):
        cond0["sdf"] = jnp.zeros((1, 1, args.maze_h, args.maze_w))
    tmpl = kp_model.init(
        k_init,
        jnp.zeros((1, K, data_dim)),
        jnp.zeros((1,), dtype=jnp.int32),
        jnp.zeros((1, K), dtype=jnp.int32),
        jnp.zeros((1, K, data_dim), dtype=bool),
        cond0,
        meta["T"],
    )["params"]
    _, payload = load_checkpoint(path, tmpl)
    kp_params = payload.get("ema", payload["params"])
    kp_schedule = make_schedule(meta["schedule"], int(meta["N_train"]))
    logit_space = bool(meta.get("logit_space", 0))
    logit_eps = float(meta.get("logit_eps", 1e-5))
    T = int(meta["T"])
    times = jnp.asarray(
        make_timesteps(int(meta["N_train"]), args.bootstrap_ddim_steps, "quadratic")
    )

    kp_feat_dim = int(meta.get("kp_feat_dim", 0)) if meta.get("use_kp_feat") else 0
    dphi_fn = None
    if getattr(args, "dphi_ckpt", None):
        from ..models.loading import make_dphi_seg_cost_fn

        dphi_fn, _ = make_dphi_seg_cost_fn(
            args.dphi_ckpt, T, meta.get("use_sdf"), bool(args.bf16))
    elif meta.get("kp_feat_dphi"):
        raise ValueError(
            "bootstrap Stage-1 ckpt was trained with D_phi kp_feat cost "
            "channels — pass --dphi_ckpt (channels 3/4 would be "
            "off-distribution zeros)")

    def sample(key: jax.Array, idx: jnp.ndarray, cond: Dict) -> jnp.ndarray:
        B, K_ = idx.shape
        if kp_feat_dim > 0:
            # the Stage-1 model was trained WITH idx features; zeros here
            # would be off-distribution and the DDIM loop amplifies the
            # resulting eps error into divergent anchors
            from ..ops.selection import build_kp_feat_full

            seg_cost = dphi_fn(cond, idx) if dphi_fn is not None else None
            cond = dict(cond)
            cond["kp_feat"] = build_kp_feat_full(idx, T, kp_feat_dim, seg_cost)
        known_mask, known_values = build_known_mask_values(
            idx, cond, data_dim, T, bool(meta["clamp_endpoints"])
        )
        if logit_space:
            known_values = logit_pos(known_values, eps=logit_eps)
        z = jax.random.normal(key, (B, K_, data_dim))
        z = jnp.where(known_mask, known_values, z)

        def eps_fn(z, t_b, **cache_kw):
            return kp_model.apply({"params": kp_params}, z, t_b, idx,
                                  known_mask, cond, T, **cache_kw)

        # Per-step position clipping, same as the sampler's stage-1 post
        # (reference sample_generate.py:383-399). Round-2 postmortem: without
        # it the cosine-1000 terminal step blew student anchors to ±650,
        # which the corruption then trained Stage-2 on (loss 20k → 1e6
        # tracking the bootstrap warmup schedule exactly).
        def post(z):
            if args.pos_clip and not logit_space:
                z = z.at[..., :2].set(
                    jnp.clip(z[..., :2], args.pos_clip_min, args.pos_clip_max))
            return jnp.where(known_mask, known_values, z)

        from ..ops.ddpm import run_solver

        x0c = getattr(args, "bootstrap_x0_clip", 0.0)
        # the serving sampler pos-clips the INITIAL noise state before the
        # first model eval (sample/generate.py stage1) — match it so the
        # scheduled-sampling anchors come from the served distribution
        z = post(z)
        z, _ = run_solver(getattr(args, "bootstrap_solver", "ddim"),
                          eps_fn, z, times, kp_schedule, post=post,
                          x0_clip=x0c if (x0c and not logit_space) else None)
        if logit_space:
            z = sigmoid_pos(z)
        return z

    best_of = int(getattr(args, "bootstrap_best_of", 1) or 1)
    if best_of <= 1:
        return sample, K

    from ..ops.anchor_search import collision_score, dp_mix_anchors
    from ..ops.keyframes import interpolate_from_indices

    def sample_best_of(key: jax.Array, idx: jnp.ndarray, cond: Dict) -> jnp.ndarray:
        """Draw N candidate anchor sets and keep the lowest-collision one
        (or the chain-DP per-anchor mix) — the SAME selection the sampler's
        --stage1_best_of serves, so Stage-2 trains on the anchor-error
        distribution it will actually refine (VERDICT round-3 item 2: under
        dp best-of-16 sampling, a Stage-2 trained on single-draw anchors
        made collision worse, 0.0268 → 0.0384)."""
        keys = jax.random.split(key, best_of)
        z_cands = jax.vmap(lambda k: sample(k, idx, cond))(keys)  # [N,B,K,D]
        occ = cond["occ"][:, 0] if cond["occ"].ndim == 4 else cond["occ"]
        if getattr(args, "bootstrap_best_of_mode", "dp") == "dp":
            return dp_mix_anchors(z_cands, idx, occ, T)
        x_cands = jax.vmap(lambda zz: interpolate_from_indices(
            idx, zz, T, recompute_velocity=False))(z_cands)
        scores = jax.vmap(lambda x: collision_score(x, occ))(x_cands)  # [N,B]
        best = jnp.argmin(scores, axis=0)
        return jnp.take_along_axis(
            z_cands, best[None, :, None, None], axis=0)[0]

    return sample_best_of, K


def make_selector_logits_fn(args):
    """Frozen selector logits for the selector/selector_level mask policies."""
    from ..models.loading import load_selector_model
    from ..ops.keyframes import compute_k_schedule

    sel_model, sel_params, sel_meta = load_selector_model(args.selector_ckpt, bool(args.bf16))
    k_list = compute_k_schedule(args.T, args.K_min, args.levels, args.k_schedule)

    def logits_fn(cond):
        if args.mask_policy == "selector_level" and sel_meta.get("use_level"):
            outs = []
            for s in range(args.levels + 1):
                lv = (s / max(1, args.levels)
                      if sel_meta.get("level_mode") == "s_norm"
                      else k_list[s] / max(1, args.T - 1))
                sc = dict(cond)
                sc["level"] = jnp.full((cond["occ"].shape[0], 1), lv)
                outs.append(sel_model.apply({"params": sel_params}, sc))
            return jnp.stack(outs, axis=1)  # [B, levels+1, T]
        sc = dict(cond)
        if sel_meta.get("use_level"):
            sc["level"] = jnp.full((cond["occ"].shape[0], 1), args.K_min / max(1, args.T - 1))
        return sel_model.apply({"params": sel_params}, sc)  # [B, T]

    return logits_fn


def _mask_mix_entries(args):
    """Parsed (policy, weight) list from --mask_policy_mix, or None."""
    if not getattr(args, "mask_policy_mix", ""):
        return None
    from .batches import parse_policy_mix

    entries = parse_policy_mix(args.mask_policy_mix)
    allowed = {"random", "uniform", "dp", "selector"}
    bad = [n for n, _ in entries if n not in allowed]
    if bad:
        raise ValueError(f"mask_policy_mix has unknown policies {bad}")
    return entries


def _mask_mix_buckets(args):
    """Static bucket order for the in-jit mix select: dp/uniform share the
    'base' bucket (both feed idx_base; the host picks which per sample)."""
    entries = _mask_mix_entries(args)
    if not entries:
        return None
    buckets = []
    for name, _ in entries:
        b = "base" if name in ("dp", "uniform") else name
        if b not in buckets:
            buckets.append(b)
    return buckets


def make_loss_fn(model: InterpLevelDenoiser, args, bootstrap_sample=None,
                 selector_logits_fn=None):
    """loss_fn(params, batch, rng); batch: x, occ, start_goal, [idx_base],
    [bootstrap_p] scalar."""
    levels = args.levels
    corr = dict(
        corrupt_mode=args.corrupt_mode,
        corrupt_sigma_max=args.corrupt_sigma_max,
        corrupt_sigma_min=args.corrupt_sigma_min,
        corrupt_sigma_pow=args.corrupt_sigma_pow,
        corrupt_anchor_frac=args.corrupt_anchor_frac,
        corrupt_index_jitter_max=args.corrupt_index_jitter_max,
        corrupt_index_jitter_prob=args.corrupt_index_jitter_prob,
        corrupt_index_jitter_pow=args.corrupt_index_jitter_pow,
        clamp_endpoints=bool(args.clamp_endpoints),
        pos_clip=bool(args.pos_clip),
        pos_clip_min=args.pos_clip_min,
        pos_clip_max=args.pos_clip_max,
        corrupt_vel=bool(args.corrupt_vel),
    )

    mix_buckets = _mask_mix_buckets(args)

    def _selector_masks(cond):
        from ..ops.keyframes import (
            build_nested_masks_from_level_logits,
            build_nested_masks_from_logits,
        )

        logits = jax.lax.stop_gradient(selector_logits_fn(cond))
        build = (build_nested_masks_from_level_logits if logits.ndim == 3
                 else build_nested_masks_from_logits)
        return build(logits, args.K_min, levels, k_schedule=args.k_schedule)

    def loss_fn(params, batch, rng):
        x0 = batch["x"]
        cond = {"occ": batch["occ"], "start_goal": batch["start_goal"]}
        if "sdf" in batch:
            cond["sdf"] = batch["sdf"]
        B, T, D = x0.shape
        k_mask, k_s, k_batch, k_boot, k_rep = jax.random.split(rng, 5)

        if mix_buckets:
            # per-sample policy mix: build each bucket's masks and select by
            # batch["mask_policy_code"] (host-assigned, same bucket order)
            code = batch["mask_policy_code"]
            k_m1, k_m2 = jax.random.split(k_mask)
            built = []
            for name in mix_buckets:
                if name == "random":
                    built.append(build_nested_masks_batch(
                        k_m1, B, T, args.K_min, levels,
                        k_schedule=args.k_schedule))
                elif name == "base":
                    built.append(build_nested_masks_from_base(
                        k_m2, batch["idx_base"], T, levels,
                        k_schedule=args.k_schedule))
                else:  # selector
                    built.append(_selector_masks(cond))
            masks_levels, idx_levels = built[0]
            idx_levels = list(idx_levels)
            for j in range(1, len(built)):
                sel = code == j
                masks_levels = jnp.where(sel[:, None, None], built[j][0],
                                         masks_levels)
                idx_levels = [jnp.where(sel[:, None], bj, io)
                              for io, bj in zip(idx_levels, built[j][1])]
        elif selector_logits_fn is not None:
            masks_levels, idx_levels = _selector_masks(cond)
        elif "idx_base" in batch:
            masks_levels, idx_levels = build_nested_masks_from_base(
                k_mask, batch["idx_base"], T, levels, k_schedule=args.k_schedule
            )
        else:
            masks_levels, idx_levels = build_nested_masks_batch(
                k_mask, B, T, args.K_min, levels, k_schedule=args.k_schedule
            )
        s_idx = sample_level_indices(k_s, B, levels, args.level_sampling, args.level_high_prob)

        # Stage-1 bootstrap: replace GT anchors at the coarsest level with
        # student DDIM samples w.p. batch["bootstrap_p"] per sample.
        x0_used = x0
        student_mask = None
        if bootstrap_sample is not None:
            idx_coarse = idx_levels[levels]
            z_pred = bootstrap_sample(k_boot, idx_coarse, cond)
            replace = (
                jax.random.uniform(k_rep, (B,)) < batch["bootstrap_p"]
            )[:, None, None]
            vals_gt = gather_keypoints(x0, idx_coarse)
            vals = jnp.where(replace, z_pred, vals_gt)
            # Scatter student values back into a copy of x0 at coarse anchors;
            # interior anchors of finer levels keep GT (matches reference
            # interior-anchor replacement at the coarsest set).
            b_ix = jnp.arange(B)[:, None]
            x0_used = x0.at[b_ix, idx_coarse].set(vals)
            student_mask = jnp.zeros((B, T), dtype=bool).at[b_ix, idx_coarse].set(
                jnp.broadcast_to(replace[:, :, 0], idx_coarse.shape)
            )

        if args.mode == "adj":
            x_s, x_prev, mask_s, mask_prev, s_idx, _, _ = build_interp_adjacent_batch(
                k_batch, x0, args.K_min, levels,
                recompute_velocity=bool(args.recompute_vel),
                x0_override=x0_used if bootstrap_sample is not None else None,
                masks_levels=masks_levels, idx_levels=idx_levels, s_idx=s_idx,
                clean_target=bool(args.clean_target), **corr,
            )
            target = x_prev - x_s
            conf_s = build_anchor_conf(
                mask_s, student_mask, args.anchor_conf_teacher,
                args.anchor_conf_student, args.anchor_conf_endpoints,
                args.anchor_conf_missing, bool(args.clamp_endpoints),
            )
            conf_prev = build_anchor_conf(
                mask_prev, student_mask, args.anchor_conf_teacher,
                args.anchor_conf_student, args.anchor_conf_endpoints,
                args.anchor_conf_missing, bool(args.clamp_endpoints),
            )
            if args.anchor_conf_anneal:
                conf_s = anneal_conf(conf_s, s_idx, levels, args.anchor_conf_anneal_mode)
                conf_prev = anneal_conf(
                    conf_prev, jnp.maximum(s_idx - 1, 0), levels, args.anchor_conf_anneal_mode
                )
            if args.anchor_conf:
                mask_in = jnp.stack(
                    [mask_s.astype(jnp.float32), mask_prev.astype(jnp.float32), conf_s],
                    axis=-1,
                )
                weight = conf_prev
            else:
                mask_in = jnp.stack(
                    [mask_s.astype(jnp.float32), mask_prev.astype(jnp.float32)], axis=-1
                )
                weight = mask_prev.astype(jnp.float32)
        else:  # x0 mode
            x_s, mask_s, s_idx, _, _ = build_interp_level_batch(
                k_batch, x0, args.K_min, levels,
                recompute_velocity=bool(args.recompute_vel),
                x0_override=x0_used if bootstrap_sample is not None else None,
                masks_levels=masks_levels, idx_levels=idx_levels, s_idx=s_idx, **corr,
            )
            target = x0 - x_s
            conf_s = build_anchor_conf(
                mask_s, student_mask, args.anchor_conf_teacher,
                args.anchor_conf_student, args.anchor_conf_endpoints,
                args.anchor_conf_missing, bool(args.clamp_endpoints),
            )
            if args.anchor_conf_anneal:
                conf_s = anneal_conf(conf_s, s_idx, levels, args.anchor_conf_anneal_mode)
            if args.anchor_conf:
                mask_in = jnp.stack([mask_s.astype(jnp.float32), conf_s], axis=-1)
                weight = conf_s
            else:
                mask_in = mask_s
                weight = mask_s.astype(jnp.float32)

        delta_hat = model.apply({"params": params}, x_s, s_idx, mask_in, cond)
        diff = ((delta_hat - target) ** 2).sum(axis=-1)
        if args.anchor_conf:
            w = args.w_missing + (args.w_anchor - args.w_missing) * weight
        else:
            w = jnp.where(weight > 0.5, args.w_anchor, args.w_missing)
        loss = (diff * w).sum() / (w.sum() * x0.shape[-1] + 1e-8)
        if args.smooth_weight > 0:
            # curvature-weighted error: the accel (smoothness) metric is the
            # second difference, which amplifies exactly the high-frequency
            # delta error the plain MSE underweights (round-4/5 finding:
            # refined smoothness ~24x interp's from iid per-frame texture).
            # Penalizing Δ²(residual) — not Δ²(prediction) — leaves the
            # target's own anchor-kink curvature free.
            r = delta_hat - target
            d2 = r[:, 2:] - 2.0 * r[:, 1:-1] + r[:, :-2]
            w2 = w[:, 1:-1]
            loss = loss + args.smooth_weight * (
                (d2 ** 2).sum(axis=-1) * w2).sum() / (
                w2.sum() * x0.shape[-1] + 1e-8)
        return loss, {}

    return loss_fn


def main(argv=None):
    args = build_argparser().parse_args(argv)
    ds, data_dim = make_dataset(args)
    loader = iter(make_loader(ds, args))
    model = build_model(args, data_dim)

    bootstrap_sample = None
    if args.bootstrap_ckpt:
        bootstrap_sample, _ = make_bootstrap_sampler(args, data_dim)

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    rng = jax.random.PRNGKey(args.seed)
    rng, k_init = jax.random.split(rng)
    sample_batch = next(loader)

    mc = mask_channels_for(args)
    init_cond = {"occ": jnp.asarray(sample_batch["occ"][:2]),
                 "start_goal": jnp.asarray(sample_batch["start_goal"][:2])}
    if args.use_sdf and "sdf" in sample_batch:
        init_cond["sdf"] = jnp.asarray(sample_batch["sdf"][:2])
    params = model.init(
        k_init,
        jnp.zeros((2, args.T, data_dim)),
        jnp.zeros((2,), dtype=jnp.int32),
        jnp.zeros((2, args.T, mc)) if mc > 1 else jnp.zeros((2, args.T), dtype=bool),
        init_cond,
    )["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model params: {n_params/1e6:.2f}M | mesh: {mesh.shape}")

    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = init_train_state(params, tx, use_ema=bool(args.use_ema))
    start_step = 0
    if args.resume:
        path = args.resume if os.path.exists(os.path.join(args.resume, "meta.json")) else latest_checkpoint(args.resume)
        if path:
            start_step, payload = load_checkpoint(path, params, state.opt_state, params)
            state = state._replace(
                step=jnp.asarray(start_step, dtype=jnp.int32),
                params=payload["params"],
                opt_state=payload.get("opt_state", state.opt_state),
                ema_params=payload.get("ema", state.ema_params),
            )
            print(f"resumed from {path} @ step {start_step}")
    state = replicate(state, mesh)

    mix_entries = _mask_mix_entries(args)
    mix_buckets = _mask_mix_buckets(args)
    selector_logits_fn = None
    needs_selector = (args.mask_policy in ("selector", "selector_level")
                      and not mix_entries) or \
        (mix_entries and any(n == "selector" for n, _ in mix_entries))
    if needs_selector:
        if not args.selector_ckpt:
            raise ValueError("selector mask policy needs --selector_ckpt")
        selector_logits_fn = make_selector_logits_fn(args)

    loss_fn = make_loss_fn(model, args, bootstrap_sample, selector_logits_fn)
    spc = max(1, args.steps_per_call)
    train_step = make_train_multi_step(
        loss_fn, tx, args.ema_decay, args.grad_accum, spc
    )

    host_rng = np.random.RandomState(args.seed + 1)
    meta = make_meta(args, data_dim)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "run_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta, "n_params": n_params}, f, indent=2)

    t0 = time.time()
    batch = sample_batch
    with mesh:
        step = start_step
        while step < args.steps:
            n_micro = min(spc, args.steps - step)
            micro = []
            for mi in range(spc):
                dev_batch = {
                    "x": batch["x"], "occ": batch["occ"],
                    "start_goal": batch["start_goal"],
                }
                if "sdf" in batch and args.use_sdf:
                    dev_batch["sdf"] = batch["sdf"]
                if mix_entries:
                    names = [n for n, _ in mix_entries]
                    w = np.asarray([v for _, v in mix_entries], np.float64)
                    picks = host_rng.choice(len(names), size=args.batch,
                                            p=w / w.sum())
                    code = np.zeros(args.batch, np.int32)
                    idx_base = sample_idx_policy(
                        host_rng, "uniform:1.0", args.batch, args.T, args.K_min
                    ).astype(np.int32)
                    for pi, name in enumerate(names):
                        rows = picks == pi
                        bucket = "base" if name in ("dp", "uniform") else name
                        code[rows] = mix_buckets.index(bucket)
                        if name == "dp":
                            if "kp_idx" not in batch:
                                raise ValueError(
                                    "mask_policy_mix includes dp but the "
                                    "dataset has no kp_idx")
                            idx_base[rows] = np.asarray(
                                batch["kp_idx"])[rows, : args.K_min].astype(np.int32)
                    dev_batch["mask_policy_code"] = code
                    dev_batch["idx_base"] = idx_base
                elif args.mask_policy == "dp" and "kp_idx" in batch:
                    dev_batch["idx_base"] = batch["kp_idx"][:, : args.K_min].astype(np.int32)
                elif args.mask_policy == "uniform":
                    dev_batch["idx_base"] = sample_idx_policy(
                        host_rng, "uniform:1.0", args.batch, args.T, args.K_min
                    )
                if bootstrap_sample is not None:
                    p = args.bootstrap_replace_prob * min(
                        1.0, (step + mi + 1) / max(1, args.bootstrap_warmup_steps)
                    )
                    dev_batch["bootstrap_p"] = np.float32(p)
                micro.append(dev_batch)
                batch = next(loader)
            dev = (shard_superbatch(stack_batches(micro), mesh) if spc > 1
                   else shard_batch(micro[0], mesh))
            rng, k_step = jax.random.split(rng)
            state, metrics = train_step(state, dev, k_step)
            step += n_micro
            if (step // spc) % max(1, args.log_every // spc) == 0:
                loss = float(metrics["loss"])
                dt = time.time() - t0
                sps = args.batch * (step - start_step) / max(dt, 1e-9)
                print(f"step {step} loss {loss:.4f} | {sps:.1f} samples/s")
            if step % args.save_every < n_micro or step >= args.steps:
                ckpt = os.path.join(args.out_dir, f"ckpt_{step}")
                save_checkpoint(
                    ckpt, state.params, state.opt_state, step,
                    state.ema_params, meta,
                )
                print(f"saved {ckpt}")
    return state


if __name__ == "__main__":
    main()
