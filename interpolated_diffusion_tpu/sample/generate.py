"""End-to-end generation: Stage-1 keypoints → interpolation → Stage-2 refine.

Capability parity with reference src/sample/sample_generate.py (the
BASELINE.json metric path, §3.3): DDIM keypoint sampling with known-endpoint
re-clamping, segment-lerp interpolation, the Stage-2 level loop (adj deltas /
x0 jump) with per-level sampling noise σ(K_s), soft anchor clamp λ(s)·conf,
hard clamp policies (endpoints / all_anchors / none, pos/all dims), and
oracle-keypoint replicas for ablation. Metrics CSV + samples.npz outputs.

TPU-native: the WHOLE pipeline — the ~20-step DDIM scan over K tokens, the
interp gather, and the levels-step Stage-2 loop over T tokens — is ONE jitted
XLA program (`make_pipeline`). Host code only feeds conditioning batches.
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.metrics import compute_metrics_batch
from ..models.denoisers import InterpLevelDenoiser, KeypointDenoiser
from ..ops.clamp import apply_clamp, apply_soft_clamp
from ..ops.ddpm import ddim_scan, make_timesteps
from ..ops.keyframes import (
    build_nested_masks_from_base,
    compute_k_schedule,
    interpolate_from_indices,
)
from ..ops.normalize import logit_pos, sigmoid_pos
from ..ops.anchor_search import collision_score as _collision_score, dp_mix_anchors as _dp_mix_anchors
from ..ops.schedules import make_schedule
from ..train.batches import (
    build_known_mask_values,
    compute_sigma_for_level,
    gather_keypoints,
)
from ..models.loading import (  # noqa: F401  (re-exported)
    load_interp_model,
    load_keypoint_model,
    load_selector_model,
)
from ..models.selector import select_topk_indices
from ..train.common import add_data_args, make_dataset, sample_idx_policy
from ..train.train_interp_levels import anneal_conf, build_anchor_conf


# ---------------------------------------------------------------------------
# the jitted pipeline
# ---------------------------------------------------------------------------

class PipelineConfig:
    """Static pipeline knobs (baked into the jitted program)."""

    def __init__(
        self,
        T: int, K: int, levels: int, K_min: int,
        ddim_steps: int = 20,
        time_spacing: str = "linear",
        k_schedule: str = "doubling",
        stage2_mode: str = "adj",
        anchor_conf: bool = False,
        anchor_conf_anneal_mode: str = "none",
        anchor_conf_teacher: float = 0.95,
        anchor_conf_endpoints: float = 1.0,
        anchor_conf_missing: float = 0.0,
        clamp_endpoints: bool = True,
        clamp_policy: str = "endpoints",   # endpoints | all_anchors | none
        clamp_dims: str = "pos",
        soft_anchor_clamp: bool = False,
        soft_clamp_schedule: str = "linear",
        soft_clamp_max: float = 0.5,
        s2_noise_mode: str = "none",       # none | constant | level
        s2_noise_sigma: float = 0.0,
        s2_noise_scale: float = 1.0,
        s2_sigma_min: float = 0.0,
        s2_sigma_pow: float = 1.0,
        pos_clip: bool = False,
        pos_clip_min: float = 0.0,
        pos_clip_max: float = 1.0,
        logit_space: bool = False,
        logit_eps: float = 1e-5,
        recompute_vel: bool = False,
        stage2_mask_policy: str = "base",  # base | selector
        collect_steps: bool = False,       # also return per-step states
        stage1_cache_interval: int = 1,    # FORA-style transformer caching
                                           # in the Stage-1 DDIM scan: run
                                           # the block stack every Nth step,
                                           # reuse its residual in between
                                           # (1 = exact)
        stage1_solver: str = "ddim",       # ddim | pfdiff | dpm
                                           # (ops/ddpm.run_solver; pfdiff/dpm
                                           # not composable w/ cache_interval)
        stage1_objective: str = "eps",     # eps (DDPM/DDIM family) | rf
                                           # (rectified flow: Euler-integrate
                                           # the velocity head; from kp meta)
        stage1_best_of: int = 1,           # sample N anchor sets and keep
                                           # the one whose interpolation has
                                           # the lowest collision rate
                                           # against the occupancy grid
                                           # (beyond-reference search knob)
        stage1_best_of_mode: str = "set",  # set: whole-trajectory argmin;
                                           # dp: per-anchor chain DP that
                                           # MIXES candidates (searches N^K
                                           # combinations in O(K N^2))
        kp_feat_dim: int = 0,              # >0: rebuild kp_feat for the
                                           # Stage-1 model (meta use_kp_feat;
                                           # zeros otherwise would be
                                           # off-distribution); cost channels
                                           # (>=5) need make_pipeline's
                                           # dphi_fn
        x0_clip: float = 0.0,              # >0: clamp the solver's per-step
                                           # x0 estimate to ±x0_clip (bounds
                                           # ALL dims — pos_clip only bounds
                                           # positions; see ops/ddpm.ddim_step
                                           # on the cosine-1000 terminal-step
                                           # amplification)
        s2_delta_smooth: int = 0,          # N>0: after each level's delta,
                                           # N passes of a 3-tap binomial
                                           # filter along T applied at
                                           # MISSING frames only (anchors
                                           # and endpoints keep their exact
                                           # values) — targets the jagged
                                           # per-frame texture of the
                                           # Stage-2 delta (refined
                                           # smoothness ~24× interp's,
                                           # docs/RESULTS.md r4 grid #4)
    ):
        self.__dict__.update(locals())
        del self.__dict__["self"]


def resolve_s2_noise_schedule(mode, sigma, sigma_min, sigma_pow, il_meta) -> Dict:
    """Resolve the Stage-2 sampling-noise schedule, defaulting unset values
    from the interp checkpoint's TRAINING corruption schedule — the
    reference's behavior (sample_generate.py:646-659 reads
    s2_corrupt_sigma_{max,min,pow} from args-or-interp-meta and its level
    mode noises with that schedule, not with s2_sample_noise_sigma)."""
    return dict(
        s2_noise_sigma=(
            float(sigma) if sigma is not None
            else float(il_meta.get("corrupt_sigma_max", 0.0))
            if mode == "level" else 0.0
        ),
        s2_sigma_min=(
            float(sigma_min) if sigma_min is not None
            else float(il_meta.get("corrupt_sigma_min", 0.0))
        ),
        s2_sigma_pow=(
            float(sigma_pow) if sigma_pow is not None
            else float(il_meta.get("corrupt_sigma_pow", 1.0))
        ),
    )


def _soft_clamp_lambda(s: int, levels: int, schedule: str, max_val: float) -> float:
    if levels <= 0:
        return float(max_val)
    frac = float(s) / float(levels)
    if schedule == "linear":
        return float(max_val) * frac
    if schedule == "cosine":
        return float(max_val) * 0.5 * (1.0 + np.cos(np.pi * (1.0 - frac)))
    return float(max_val)


def make_pipeline(
    kp_model, interp_model, kp_schedule, cfg: PipelineConfig, data_dim: int,
    dphi_fn=None,
):
    """Returns pipeline(kp_params, interp_params, key, idx, cond) ->
    (x_interp, x_refined, z_pred). Fully jittable; one XLA program."""
    T, K, levels = cfg.T, cfg.K, cfg.levels
    times = jnp.asarray(
        make_timesteps(kp_schedule.n_timesteps, cfg.ddim_steps, cfg.time_spacing)
    )
    k_list = compute_k_schedule(T, cfg.K_min, levels, cfg.k_schedule)

    def clip_pos(z):
        if not cfg.pos_clip:
            return z
        return z.at[..., :2].set(jnp.clip(z[..., :2], cfg.pos_clip_min, cfg.pos_clip_max))

    def stage1(kp_params, key, idx, cond):
        B = idx.shape[0]
        if cfg.kp_feat_dim > 0:
            from ..ops.selection import build_kp_feat_full

            seg_cost = dphi_fn(cond, idx) if dphi_fn is not None else None
            cond = dict(cond)
            cond["kp_feat"] = build_kp_feat_full(
                idx, T, cfg.kp_feat_dim, seg_cost)
        known_mask, known_values = build_known_mask_values(
            idx, cond, data_dim, T, cfg.clamp_endpoints
        )
        if cfg.logit_space:
            known_values = logit_pos(known_values, eps=cfg.logit_eps)
        z = jax.random.normal(key, (B, K, data_dim))
        z = clip_pos(jnp.where(known_mask, known_values, z))

        def eps_fn(z, t_b, **cache_kw):
            return kp_model.apply({"params": kp_params}, z, t_b, idx,
                                  known_mask, cond, T, **cache_kw)

        post = lambda z: clip_pos(jnp.where(known_mask, known_values, z))
        if cfg.stage1_objective == "rf":
            if cfg.stage1_cache_interval > 1 or cfg.stage1_solver != "ddim":
                raise ValueError(
                    "rf checkpoints integrate their velocity field directly "
                    "— stage1_solver/cache_interval do not apply")
            from ..ops.rectified_flow import rf_integrate

            n_tr = kp_schedule.n_timesteps

            def velocity_fn(z, t_cont):
                t_emb = (t_cont * (n_tr - 1)).astype(jnp.int32)
                return kp_model.apply({"params": kp_params}, z, t_emb, idx,
                                      known_mask, cond, T)

            z = rf_integrate(velocity_fn, z, cfg.ddim_steps, post=post)
            z_steps = None
        else:
            from ..ops.ddpm import run_solver

            z, z_steps = run_solver(
                cfg.stage1_solver, eps_fn, z, times, kp_schedule,
                post=post, collect=cfg.collect_steps,
                cache_interval=cfg.stage1_cache_interval,
                delta0=jnp.zeros((B, K, kp_model.d_model), kp_model.dtype),
                x0_clip=cfg.x0_clip if cfg.x0_clip > 0 else None,
            )
        if cfg.logit_space:
            z = sigmoid_pos(z)
            # z_steps can be None under pfdiff with a 1-2 interval grid
            # (no springboard groups to collect)
            if cfg.collect_steps and z_steps is not None:
                z_steps = sigmoid_pos(z_steps)
        return (z, z_steps) if cfg.collect_steps else z

    def stage2(interp_params, key, x_pred, idx, cond, selector_logits=None):
        B = idx.shape[0]
        if cfg.stage2_mask_policy == "selector" and selector_logits is not None:
            from ..ops.keyframes import build_nested_masks_from_logits

            masks_levels, _ = build_nested_masks_from_logits(
                selector_logits, cfg.K_min, levels, k_schedule=cfg.k_schedule
            )
        else:
            masks_levels, _ = build_nested_masks_from_base(
                key, idx, T, levels, k_schedule=cfg.k_schedule
            )
        x = x_pred
        x_steps = []
        noise_keys = jax.random.split(jax.random.fold_in(key, 7), levels + 1)
        if cfg.stage2_mode == "x0":
            s_iter = [levels]
        else:
            s_iter = list(range(levels, 0, -1))
        for s in s_iter:
            mask_s = masks_levels[:, s]
            mask_prev = masks_levels[:, s - 1] if cfg.stage2_mode == "adj" else None
            conf_s = None
            if cfg.anchor_conf:
                conf_s = build_anchor_conf(
                    mask_s, None, cfg.anchor_conf_teacher, 0.5,
                    cfg.anchor_conf_endpoints, cfg.anchor_conf_missing,
                    cfg.clamp_endpoints,
                )
                conf_s = anneal_conf(
                    conf_s, jnp.full((B,), s), levels, cfg.anchor_conf_anneal_mode
                )
            if cfg.stage2_mode == "adj":
                chans = [mask_s.astype(jnp.float32), mask_prev.astype(jnp.float32)]
                if conf_s is not None:
                    chans.append(conf_s)
                mask_in = jnp.stack(chans, axis=-1)
            else:
                if conf_s is not None:
                    mask_in = jnp.stack([mask_s.astype(jnp.float32), conf_s], axis=-1)
                else:
                    mask_in = mask_s
            s_level = jnp.full((B,), s, dtype=jnp.int32)
            delta = interp_model.apply({"params": interp_params}, x, s_level, mask_in, cond)
            x = x + delta
            if cfg.s2_delta_smooth > 0:
                # binomial smoothing at missing frames: iid per-frame
                # prediction noise dominates the accel metric (second
                # difference amplifies high frequencies); anchors/endpoints
                # are reasserted so interpolation invariants hold
                keep = mask_s
                keep = keep.at[:, 0].set(True).at[:, -1].set(True)
                for _ in range(cfg.s2_delta_smooth):
                    xs = (0.25 * jnp.roll(x, 1, axis=1) + 0.5 * x
                          + 0.25 * jnp.roll(x, -1, axis=1))
                    xs = xs.at[:, 0].set(x[:, 0]).at[:, -1].set(x[:, -1])
                    x = jnp.where(keep[..., None], x, xs)
            # level-tied sampling noise on missing frames
            if cfg.s2_noise_mode != "none":
                sigma = (
                    cfg.s2_noise_sigma
                    if cfg.s2_noise_mode == "constant"
                    else compute_sigma_for_level(
                        int(k_list[s]), cfg.K_min, cfg.s2_noise_sigma,
                        cfg.s2_sigma_min, cfg.s2_sigma_pow,
                    )
                )
                if sigma > 0 and cfg.s2_noise_scale > 0:
                    nz = jax.random.normal(noise_keys[s], (B, T, 2)) * sigma * cfg.s2_noise_scale
                    nz = nz * (~mask_s)[..., None]
                    x = x.at[..., :2].add(nz)
            if cfg.soft_anchor_clamp and conf_s is not None:
                lam = _soft_clamp_lambda(s, levels, cfg.soft_clamp_schedule, cfg.soft_clamp_max)
                x = apply_soft_clamp(x, x_pred, conf_s, lam, cfg.clamp_dims)
            if cfg.clamp_policy == "all_anchors":
                x = apply_clamp(x, x_pred, mask_s, cfg.clamp_dims)
            elif cfg.clamp_policy == "endpoints":
                end_mask = jnp.zeros_like(mask_s).at[:, 0].set(True).at[:, -1].set(True)
                x = apply_clamp(x, x_pred, end_mask, cfg.clamp_dims)
            x = clip_pos(x)
            if cfg.collect_steps:
                x_steps.append(x)
        if cfg.collect_steps:
            return x, jnp.stack(x_steps, axis=0)
        return x

    def pipeline(kp_params, interp_params, key, idx, cond,
                 z_override: Optional[jnp.ndarray] = None,
                 selector_logits: Optional[jnp.ndarray] = None):
        k1, k2 = jax.random.split(key)
        # hoist the maze-CNN conditioning out of the diffusion scans: ONE
        # encoder pass per model instead of one per DDIM/level step (the
        # scan body is opaque to XLA, so it cannot do this hoist itself)
        kp_cond = hoist_cond_vec(kp_model, kp_params, cond)
        it_cond = hoist_cond_vec(interp_model, interp_params, cond)
        z_steps = None
        if z_override is not None:
            z_pred = z_override
        elif cfg.collect_steps:
            z_pred, z_steps = stage1(kp_params, k1, idx, kp_cond)
        elif cfg.stage1_best_of > 1:
            # best-of-N anchors: sample N candidate sets, keep the one whose
            # interpolation collides least with the occupancy grid — the
            # grid is part of the conditioning, so this is oracle-free
            keys = jax.random.split(k1, cfg.stage1_best_of)
            z_cands = jax.vmap(
                lambda k: stage1(kp_params, k, idx, kp_cond))(keys)
            x_cands = jax.vmap(lambda z: interpolate_from_indices(
                idx, z, T, recompute_velocity=cfg.recompute_vel))(z_cands)
            occ = cond["occ"][:, 0] if cond["occ"].ndim == 4 else cond["occ"]
            if cfg.stage1_best_of_mode == "dp":
                z_pred = _dp_mix_anchors(z_cands, idx, occ, T)
            else:
                scores = jax.vmap(
                    lambda x: _collision_score(x, occ))(x_cands)  # [N, B]
                best = jnp.argmin(scores, axis=0)                # [B]
                z_pred = jnp.take_along_axis(
                    z_cands, best[None, :, None, None], axis=0)[0]
        else:
            z_pred = stage1(kp_params, k1, idx, kp_cond)
        x_interp = interpolate_from_indices(
            idx, z_pred, T, recompute_velocity=cfg.recompute_vel
        )
        s2 = stage2(interp_params, k2, x_interp, idx, it_cond, selector_logits)
        if cfg.collect_steps:
            x_refined, x_steps = s2
            if z_steps is None:
                z_steps = jnp.broadcast_to(z_pred[None],
                                           (1, *z_pred.shape))
            return x_interp, x_refined, z_pred, (z_steps, x_steps)
        return x_interp, s2, z_pred

    return pipeline


def hoist_cond_vec(model, params, cond):
    """Precompute a denoiser's MazeConditionEncoder output once, returning a
    cond dict with `cond_vec` set (the denoisers skip their in-scan encoder
    when it is present). No-op when there is nothing to encode."""
    if cond is None or "occ" not in cond or "cond_enc" not in params:
        return cond
    from ..models.encoders import MazeConditionEncoder

    enc = MazeConditionEncoder(
        use_sdf=model.use_sdf, d_cond=model.d_cond,
        use_start_goal=model.use_start_goal,
        maze_channels=model.maze_channels, dtype=model.dtype,
    )
    vec = enc.apply({"params": params["cond_enc"]}, cond)
    out = dict(cond)
    out["cond_vec"] = vec
    return out


def export_viz(args, cond, idx, z_pred, x_interp, x_refined, gt, steps, T):
    """Per-sample PNG plots and per-step diffusion frames + GIF.

    Parity with reference sample_generate.py :1400-1513 (sample plots) and
    :1515-1642 (per-step frames + video export; GIF here — ffmpeg-free).
    """
    from ..eval.visualize import plot_occupancy_trajectories

    occ = np.asarray(cond["occ"])
    sg = np.asarray(cond["start_goal"])
    plots_dir = os.path.join(args.out_dir, "plots")
    os.makedirs(plots_dir, exist_ok=True)
    for b in range(min(int(args.save_plots), x_interp.shape[0])):
        plot_occupancy_trajectories(
            occ[b], [np.asarray(gt)[b], np.asarray(x_interp)[b],
                     np.asarray(x_refined)[b]],
            labels=["gt", "interp", "refined"],
            keypoints=np.asarray(z_pred)[b], start_goal=sg[b],
            out_path=os.path.join(plots_dir, f"sample_{b:03d}.png"),
            title=f"sample {b}",
        )
    if not (args.save_steps and steps is not None):
        return
    z_steps, x_steps = steps       # [S1,B,K,D], [S2,B,T,D]
    frames_dir = os.path.join(args.out_dir, "steps")
    os.makedirs(frames_dir, exist_ok=True)
    frames = []
    for si in range(z_steps.shape[0]):
        traj = np.asarray(interpolate_from_indices(
            idx[:1], z_steps[si][:1], T))[0]
        frames.append(("stage1", si, traj))
    for si in range(x_steps.shape[0]):
        frames.append(("stage2", si, np.asarray(x_steps[si][0])))
    paths = []
    for fi, (stage, si, traj) in enumerate(frames):
        paths.append(plot_occupancy_trajectories(
            occ[0], [np.asarray(gt)[0], traj], labels=["gt", stage],
            keypoints=np.asarray(z_pred)[0], start_goal=sg[0],
            out_path=os.path.join(frames_dir, f"frame_{fi:03d}.png"),
            title=f"{stage} step {si}",
        ))
    try:
        from PIL import Image

        imgs = [Image.open(p) for p in paths]
        imgs[0].save(os.path.join(args.out_dir, "diffusion_steps.gif"),
                     save_all=True, append_images=imgs[1:], duration=200,
                     loop=0)
    except Exception as e:  # PNG frames remain the durable output
        print(f"gif export skipped ({e})")


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sample_generate (end-to-end, TPU)")
    p.add_argument("--kp_ckpt", type=str, required=True)
    p.add_argument("--interp_ckpt", type=str, required=True)
    p.add_argument("--use_ema", type=int, default=1)
    p.add_argument("--num_batches", type=int, default=4)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--ddim_steps", type=int, default=20)
    p.add_argument("--time_spacing", type=str, default="quadratic",
                   choices=["linear", "quadratic", "sqrt"],
                   help="DDIM step spacing (reference sample_generate.py:52 "
                        "defaults to quadratic)")
    p.add_argument("--kp_index_mode", type=str, default="uniform",
                   choices=["random", "uniform", "uniform_jitter", "selector"])
    p.add_argument("--kp_jitter", type=float, default=0.0)
    p.add_argument("--selector_ckpt", type=str, default=None)
    p.add_argument("--dphi_ckpt", type=str, default=None,
                   help="segment-cost ckpt for the kp_feat cost channels; "
                        "required when the Stage-1 meta says kp_feat_dphi")
    p.add_argument("--selector_stochastic", type=int, default=0)
    p.add_argument("--selector_tau", type=float, default=1.0)
    p.add_argument("--stage2_mask_policy", type=str, default="base",
                   choices=["base", "selector"])
    p.add_argument("--stage2_mode", type=str, default=None, help="default: from meta")
    p.add_argument("--clamp_policy", type=str, default="endpoints",
                   choices=["endpoints", "all_anchors", "none"])
    p.add_argument("--clamp_dims", type=str, default="pos", choices=["pos", "all"])
    p.add_argument("--soft_anchor_clamp", type=int, default=0)
    p.add_argument("--s2_delta_smooth", type=int, default=0,
                   help="N passes of 3-tap binomial smoothing at missing "
                        "frames after each Stage-2 level (0 = off); "
                        "anchors/endpoints keep exact values")
    p.add_argument("--anchor_conf_override", type=float, default=None,
                   help="confidence presented for interior anchors in the "
                        "Stage-2 conf channel (default: the training "
                        "teacher value, 0.95). Stage-1 anchors at sample "
                        "time are STUDENT-quality — a bootstrap-trained "
                        "Stage-2 saw that error distribution labeled "
                        "anchor_conf_student (0.5), so presenting 0.95 "
                        "understates the error and under-corrects; this "
                        "flag closes the train/test conf mismatch "
                        "(docs/RESULTS.md round-5 A/B)")
    p.add_argument("--soft_clamp_schedule", type=str, default="linear")
    p.add_argument("--soft_clamp_max", type=float, default=0.5)
    p.add_argument("--s2_noise_mode", type=str, default="none",
                   choices=["none", "constant", "level"])
    p.add_argument("--s2_noise_sigma", type=float, default=None,
                   help="level mode: σ_max of the per-level schedule "
                        "(default: the interp ckpt's corrupt_sigma_max — "
                        "the reference resolves the sampling-noise schedule "
                        "from the training corruption schedule in meta, "
                        "sample_generate.py:646-659); constant mode: the σ")
    p.add_argument("--s2_sigma_min", type=float, default=None,
                   help="level-mode σ floor (default: meta corrupt_sigma_min)")
    p.add_argument("--s2_sigma_pow", type=float, default=None,
                   help="level-mode σ decay power (default: meta corrupt_sigma_pow)")
    p.add_argument("--s2_noise_scale", type=float, default=1.0)
    p.add_argument("--pos_clip", type=int, default=1)
    p.add_argument("--x0_clip", type=float, default=0.0,
                   help=">0: clamp the Stage-1 solver's per-step x0 estimate "
                        "to ±x0_clip across ALL dims (velocity dims included "
                        "— pos_clip only bounds positions); guards the "
                        "cosine-1000 terminal-step error amplification")
    p.add_argument("--compare_oracle", type=int, default=0)
    p.add_argument("--stage1_best_of", type=int, default=1,
                   help="sample N Stage-1 anchor sets and keep the lowest-"
                        "collision interpolation per sample (oracle-free "
                        "occupancy scoring; beyond-reference quality knob)")
    p.add_argument("--stage1_best_of_mode", type=str, default="set",
                   choices=["set", "dp"],
                   help="set: whole-trajectory argmin over the N candidates; "
                        "dp: per-anchor chain DP that mixes candidates "
                        "(searches N^K assignments in O(K N^2))")
    p.add_argument("--stage1_cache_interval", type=int, default=1,
                   help="FORA-style transformer caching in the Stage-1 DDIM "
                        "scan: full block-stack evaluation every Nth step, "
                        "cached residual in between (1 = exact; 2 ≈ halves "
                        "Stage-1 compute at a small anchor-error cost)")
    p.add_argument("--stage1_solver", type=str, default="ddim",
                   choices=["ddim", "pfdiff", "dpm"],
                   help="pfdiff: past-score springboard — ~half the Stage-1 "
                        "model evals on the same grid; dpm: DPM-Solver++(2M)"
                        " — 2nd-order accuracy per eval (use fewer steps). "
                        "Both mutually exclusive with cache_interval>1")
    p.add_argument("--stage1_cache", type=str, default="")
    p.add_argument("--stage1_cache_mode", type=str, default="none",
                   choices=["none", "save", "load", "auto"])
    p.add_argument("--sample_seed", type=int, default=1234)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--out_dir", type=str, default="runs/samples")
    p.add_argument("--save_npz", type=int, default=1)
    p.add_argument("--sanity", type=int, default=0,
                   help="exit non-zero when the summary trips the hard "
                        "quality thresholds (check_summary_sanity) so "
                        "pipeline steps cannot mark a broken run OK; the "
                        "verdict is recorded in summary.json either way "
                        "(pipelines pass --sanity 1; tiny test models would "
                        "trip it by design)")
    p.add_argument("--save_plots", type=int, default=0,
                   help="plot the first N samples of batch 0 as PNGs")
    p.add_argument("--save_steps", type=int, default=0,
                   help="export per-step diffusion frames (PNG + GIF) for "
                        "sample 0 of batch 0 (reference :1515-1642)")
    add_data_args(p)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    kp_model, kp_params, kp_meta = load_keypoint_model(args.kp_ckpt, bool(args.bf16), bool(args.use_ema))
    interp_model, interp_params, il_meta = load_interp_model(args.interp_ckpt, bool(args.bf16), bool(args.use_ema))

    T, K = int(kp_meta["T"]), int(kp_meta["K"])
    levels, K_min = int(il_meta["levels"]), int(il_meta["K_min"])
    cfg = PipelineConfig(
        T=T, K=K, levels=levels, K_min=K_min,
        ddim_steps=args.ddim_steps, time_spacing=args.time_spacing,
        k_schedule=il_meta.get("k_schedule", "doubling"),
        stage2_mode=args.stage2_mode or il_meta.get("mode", "adj"),
        anchor_conf=bool(il_meta.get("anchor_conf", 0)),
        anchor_conf_teacher=(
            args.anchor_conf_override if args.anchor_conf_override is not None
            else float(il_meta.get("anchor_conf_teacher", 0.95))
        ),
        anchor_conf_anneal_mode=(
            il_meta.get("anchor_conf_anneal_mode", "none")
            if il_meta.get("anchor_conf_anneal") else "none"
        ),
        clamp_endpoints=bool(kp_meta.get("clamp_endpoints", 1)),
        clamp_policy=args.clamp_policy, clamp_dims=args.clamp_dims,
        soft_anchor_clamp=bool(args.soft_anchor_clamp),
        soft_clamp_schedule=args.soft_clamp_schedule,
        soft_clamp_max=args.soft_clamp_max,
        s2_noise_mode=args.s2_noise_mode,
        **resolve_s2_noise_schedule(
            args.s2_noise_mode, args.s2_noise_sigma, args.s2_sigma_min,
            args.s2_sigma_pow, il_meta,
        ),
        s2_noise_scale=args.s2_noise_scale,
        pos_clip=bool(args.pos_clip),
        logit_space=bool(kp_meta.get("logit_space", 0)),
        logit_eps=float(kp_meta.get("logit_eps", 1e-5)),
        recompute_vel=bool(il_meta.get("recompute_vel", 0)) and int(kp_meta["data_dim"]) == 4,
        x0_clip=args.x0_clip,
        s2_delta_smooth=args.s2_delta_smooth,
        stage2_mask_policy=args.stage2_mask_policy,
        collect_steps=bool(args.save_steps),
        stage1_cache_interval=args.stage1_cache_interval,
        stage1_solver=args.stage1_solver,
        stage1_objective=kp_meta.get("objective", "eps"),
        stage1_best_of=args.stage1_best_of,
        stage1_best_of_mode=args.stage1_best_of_mode,
        kp_feat_dim=(int(kp_meta.get("kp_feat_dim", 0))
                     if kp_meta.get("use_kp_feat") else 0),
    )
    selector = None
    if args.kp_index_mode == "selector" or args.stage2_mask_policy == "selector":
        if not args.selector_ckpt:
            raise ValueError("selector mode requested but --selector_ckpt missing")
        sel_model, sel_params, sel_meta = load_selector_model(
            args.selector_ckpt, bool(args.bf16)
        )
        selector = jax.jit(lambda cond: sel_model.apply({"params": sel_params}, cond))
    dphi_fn = None
    if args.dphi_ckpt:
        from ..models.loading import make_dphi_seg_cost_fn

        dphi_fn, _ = make_dphi_seg_cost_fn(
            args.dphi_ckpt, T, kp_meta.get("use_sdf"), bool(args.bf16))
    elif kp_meta.get("kp_feat_dphi"):
        raise ValueError(
            "Stage-1 ckpt was trained with D_phi kp_feat cost channels "
            "(meta kp_feat_dphi=1) — pass --dphi_ckpt or sampling runs "
            "off-distribution (channels 3/4 zero)")
    kp_schedule = make_schedule(kp_meta["schedule"], int(kp_meta["N_train"]))
    data_dim = int(kp_meta["data_dim"])
    pipeline = jax.jit(make_pipeline(
        kp_model, interp_model, kp_schedule, cfg, data_dim, dphi_fn))

    args.T = T  # for make_dataset
    ds, _ = make_dataset(args)
    host_rng = np.random.RandomState(args.sample_seed)
    key = jax.random.PRNGKey(args.sample_seed)

    os.makedirs(args.out_dir, exist_ok=True)
    csv_path = os.path.join(args.out_dir, "metrics.csv")
    rows = []
    all_out = {"interp": [], "refined": [], "keypoints": [], "idx": [], "gt": []}
    policy = {"random": "random:1.0", "uniform": "uniform:1.0",
              "uniform_jitter": "uniform:1.0", "selector": "uniform:1.0"}[args.kp_index_mode]
    jitter = args.kp_jitter if args.kp_index_mode == "uniform_jitter" else 0.0

    t_total, n_total = 0.0, 0
    for bi in range(args.num_batches):
        indices = host_rng.randint(0, len(ds), size=args.batch)
        batch = ds.get_batch(indices)
        cond = {"occ": jnp.asarray(batch["occ"]),
                "start_goal": jnp.asarray(batch["start_goal"])}
        if "sdf" in batch and (kp_meta.get("use_sdf") or il_meta.get("use_sdf")
                               or (selector is not None
                                   and sel_meta.get("use_sdf"))):
            cond["sdf"] = jnp.asarray(batch["sdf"])
        sel_logits = None
        if selector is not None:
            sel_cond = dict(cond)
            if sel_meta.get("use_level"):
                sel_cond["level"] = jnp.full((args.batch, 1), K / max(1, T - 1))
            sel_logits = selector(sel_cond)
        if args.kp_index_mode == "selector":
            key, k_sel = jax.random.split(key)
            idx = select_topk_indices(
                sel_logits, K, bool(args.selector_stochastic),
                args.selector_tau, k_sel,
            )
        else:
            idx = jnp.asarray(sample_idx_policy(
                host_rng, policy, args.batch, T, K, None, jitter))
        key, k_b = jax.random.split(key)
        # Stage-1 cache (reference sample_generate.py:894-906, :953-972):
        # persist {idx, z_pred} per batch; endpoint-consistency is validated
        # on load against the current conditioning.
        z_override = None
        cache_path = (os.path.join(args.stage1_cache, f"stage1_{bi:04d}.npz")
                      if args.stage1_cache else None)
        mode = args.stage1_cache_mode
        if cache_path and mode in ("load", "auto") and os.path.exists(cache_path):
            with np.load(cache_path) as f:
                idx = jnp.asarray(f["idx"])
                z_override = jnp.asarray(f["z_pred"])
            sg = np.asarray(cond["start_goal"])
            z_np = np.asarray(z_override)
            first_is_start = np.asarray(idx)[:, 0] == 0
            if np.any(first_is_start):
                err = np.abs(z_np[first_is_start, 0, :2]
                             - sg[first_is_start, :2]).max()
                if err > 1e-3:
                    raise ValueError(
                        f"stage1 cache {cache_path} endpoint mismatch ({err:.4f}); "
                        "conditioning changed since the cache was written")
        t0 = time.time()
        out = pipeline(
            kp_params, interp_params, k_b, idx, cond, z_override, sel_logits)
        x_interp, x_refined, z_pred = out[:3]
        steps = out[3] if len(out) > 3 else None
        if cache_path and (mode == "save" or (mode == "auto"
                                              and not os.path.exists(cache_path))):
            os.makedirs(args.stage1_cache, exist_ok=True)
            np.savez_compressed(cache_path, idx=np.asarray(idx),
                                z_pred=np.asarray(z_pred))
        x_refined.block_until_ready()
        dt = time.time() - t0
        if bi > 0:  # skip compile batch in throughput
            t_total += dt
            n_total += args.batch

        gt = jnp.asarray(batch["x"])
        m_i = compute_metrics_batch(cond["occ"], x_interp, cond["start_goal"][:, 2:], gt)
        m_r = compute_metrics_batch(cond["occ"], x_refined, cond["start_goal"][:, 2:], gt)
        variants = {"interp": m_i, "refined": m_r}
        if args.compare_oracle:
            z_oracle = gather_keypoints(gt, idx)
            xo_i, xo_r = pipeline(kp_params, interp_params, k_b, idx, cond,
                                  z_oracle)[:2]
            variants["oracle_interp"] = compute_metrics_batch(
                cond["occ"], xo_i, cond["start_goal"][:, 2:], gt)
            variants["oracle_refined"] = compute_metrics_batch(
                cond["occ"], xo_r, cond["start_goal"][:, 2:], gt)
        for b in range(args.batch):
            row = {"batch": bi, "sample": b}
            for vname, vm in variants.items():
                for mname, mv in vm.items():
                    row[f"{vname}_{mname}"] = float(mv[b])
            rows.append(row)
        all_out["interp"].append(np.asarray(x_interp))
        all_out["refined"].append(np.asarray(x_refined))
        all_out["keypoints"].append(np.asarray(z_pred))
        all_out["idx"].append(np.asarray(idx))
        all_out["gt"].append(np.asarray(batch["x"]))
        all_out.setdefault("occ", []).append(np.asarray(batch["occ"]))
        all_out.setdefault("start_goal", []).append(np.asarray(batch["start_goal"]))
        if bi == 0 and (args.save_plots or args.save_steps):
            export_viz(args, cond, idx, z_pred, x_interp, x_refined, gt, steps, T)
        print(f"batch {bi}: {dt:.3f}s "
              f"coll(interp)={float(m_i['collision_rate'].mean()):.4f} "
              f"coll(refined)={float(m_r['collision_rate'].mean()):.4f} "
              f"succ={float(m_r['success'].mean()):.3f}")

    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    summary = {
        k: float(np.mean([r[k] for r in rows]))
        for k in rows[0] if k not in ("batch", "sample")
    }
    if n_total:
        summary["samples_per_sec"] = n_total / t_total
    sanity = check_summary_sanity(summary)
    summary["sanity"] = sanity
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    from ..utils.run_config import archive_evidence, write_run_config
    write_run_config(args.out_dir, args)
    archive_evidence(args.out_dir)
    if args.save_npz:
        np.savez_compressed(
            os.path.join(args.out_dir, "samples.npz"),
            **{k: np.concatenate(v) for k, v in all_out.items()},
        )
    print("summary:", json.dumps(summary, indent=2))
    if sanity["failures"] and args.sanity:
        # a broken quality run must never land silently (round-2 regression:
        # the rundown marked d4rl "OK" with refined collision 0.976)
        print("SANITY FAILED:", "; ".join(sanity["failures"]), file=sys.stderr)
        sys.exit(2)
    return summary


def check_summary_sanity(summary: Dict[str, float]) -> Dict:
    """Hard quality thresholds for sampling summaries.

    Flags pathological results that indicate a broken pipeline rather than a
    merely-weak model: Stage-2 making trajectories drastically worse, or
    MSE-to-GT at garbage magnitudes (data lives in [0,1]^2 positions)."""
    failures = []

    def g(k):
        return summary.get(k)

    # bare-key variant (the causal sampler's summary has no interp/refined
    # split — one generated trajectory per sample)
    bm = g("mse_to_gt")
    if bm is not None and bm > 5.0:
        failures.append(f"mse_to_gt={bm:.3f} > 5.0")
    for pre in ("", "oracle_"):
        im, rm = g(f"{pre}interp_mse_to_gt"), g(f"{pre}refined_mse_to_gt")
        ic, rc = g(f"{pre}interp_collision_rate"), g(f"{pre}refined_collision_rate")
        if im is not None and im > 5.0:
            failures.append(f"{pre}interp_mse_to_gt={im:.3f} > 5.0")
        if rm is not None and im is not None and rm > max(10.0 * im, im + 0.5):
            failures.append(
                f"{pre}refined_mse_to_gt={rm:.3f} >> interp {im:.3f} "
                "(Stage-2 diverges)")
        if rc is not None and ic is not None and rc > ic + 0.2:
            failures.append(
                f"{pre}refined_collision={rc:.3f} > interp {ic:.3f} + 0.2")
    return {"ok": not failures, "failures": failures}


if __name__ == "__main__":
    main()
