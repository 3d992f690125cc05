"""Keypoint selector trainer (BCE vs DP labels).

Parity with reference src/train/train_keypoint_selector.py: per-frame BCE
against DP keypoint labels (per-level `kp_mask_levels` supported, with level
conditioning k_norm/s_norm), positive-class weighting (T−K_s)/K_s, optional
KL-to-uniform regularizer with cosine/linear temperature anneal.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.selector import KeypointSelector
from ..ops.keyframes import compute_k_schedule
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .common import add_data_args, add_train_args, make_dataset, make_loader
from .state import init_train_state, make_optimizer, make_train_step


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_keypoint_selector (TPU)")
    p.add_argument("--T", type=int, default=64)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--n_heads", type=int, default=8)
    p.add_argument("--d_ff", type=int, default=512)
    p.add_argument("--n_layers_sel", type=int, default=2)
    p.add_argument("--pos_dim", type=int, default=64)
    p.add_argument("--maze_channels", type=str, default="32,64,128,128")
    p.add_argument("--cond_start_goal", type=int, default=1)
    p.add_argument("--use_sg_map", type=int, default=1)
    p.add_argument("--use_sg_token", type=int, default=1)
    p.add_argument("--use_goal_dist_token", type=int, default=0)
    p.add_argument("--use_cond_bias", type=int, default=0)
    p.add_argument("--cond_bias_mode", type=str, default="memory", choices=["memory", "encoder"])
    p.add_argument("--use_level", type=int, default=0)
    p.add_argument("--level_mode", type=str, default="k_norm", choices=["k_norm", "s_norm"])
    p.add_argument("--levels", type=int, default=8)
    p.add_argument("--k_schedule", type=str, default="geom", choices=["doubling", "linear", "geom"])
    p.add_argument("--k_geom_gamma", type=float, default=None)
    p.add_argument("--sg_map_sigma", type=float, default=1.5)
    p.add_argument("--sel_kl_weight", type=float, default=0.02)
    p.add_argument("--sel_tau_start", type=float, default=1.0)
    p.add_argument("--sel_tau_end", type=float, default=0.3)
    p.add_argument("--sel_tau_anneal", type=str, default="cosine", choices=["none", "linear", "cosine"])
    p.add_argument("--sel_tau_frac", type=float, default=0.8)
    add_data_args(p)
    add_train_args(p)
    return p


def anneal_tau(step: int, total: int, start: float, end: float, frac: float, mode: str) -> float:
    if mode == "none":
        return start
    horizon = max(1, int(total * max(0.0, min(1.0, frac))))
    t = min(step / horizon, 1.0)
    if mode == "linear":
        return start + (end - start) * t
    if mode == "cosine":
        return end + (start - end) * 0.5 * (1.0 + math.cos(math.pi * t))
    return start


def main(argv=None):
    args = build_argparser().parse_args(argv)
    ds, _ = make_dataset(args)
    loader = iter(make_loader(ds, args))
    batch0 = next(loader)
    if "kp_idx" not in batch0 and "kp_mask_levels" not in batch0:
        raise ValueError("selector training needs kp_idx or kp_mask_levels in the dataset "
                         "(run scripts/prepare_dp_keypoints.py)")
    has_levels = "kp_mask_levels" in batch0
    k_list = compute_k_schedule(args.T, args.K, args.levels, args.k_schedule, args.k_geom_gamma)
    k_arr = jnp.asarray(k_list, dtype=jnp.float32)

    model = KeypointSelector(
        T=args.T, d_model=args.d_model, n_heads=args.n_heads, d_ff=args.d_ff,
        n_layers=args.n_layers_sel, pos_dim=args.pos_dim,
        use_sdf=bool(args.use_sdf), use_start_goal=bool(args.cond_start_goal),
        use_sg_map=bool(args.use_sg_map), use_sg_token=bool(args.use_sg_token),
        use_goal_dist_token=bool(args.use_goal_dist_token),
        use_cond_bias=bool(args.use_cond_bias), cond_bias_mode=args.cond_bias_mode,
        use_level=bool(args.use_level), sg_map_sigma=args.sg_map_sigma,
        maze_channels=tuple(int(c) for c in args.maze_channels.split(",")),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    def loss_fn(params, batch, rng):
        cond = {"occ": batch["occ"], "start_goal": batch["start_goal"]}
        if "sdf" in batch:
            cond["sdf"] = batch["sdf"]
        B = batch["occ"].shape[0]
        if has_levels:
            s_idx = jax.random.randint(rng, (B,), 1, args.levels + 1)
            target = jnp.take_along_axis(
                batch["kp_mask_levels"].astype(jnp.float32),
                s_idx[:, None, None], axis=1,
            )[:, 0]
            K_s = k_arr[s_idx]
            if args.use_level:
                lv = (s_idx.astype(jnp.float32) / max(1, args.levels)
                      if args.level_mode == "s_norm" else K_s / max(1, args.T - 1))
                cond["level"] = lv[:, None]
        else:
            kp_idx = batch["kp_idx"].astype(jnp.int32)
            target = jnp.zeros((B, args.T)).at[
                jnp.arange(B)[:, None], kp_idx
            ].set(1.0)
            K_s = jnp.full((B,), float(args.K))
            if args.use_level:
                lv = (jnp.ones((B,)) if args.level_mode == "s_norm"
                      else jnp.full((B,), args.K / max(1, args.T - 1)))
                cond["level"] = lv[:, None]

        logits = model.apply({"params": params}, cond)
        # BCE with per-sample positive weighting
        bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        pos_w = (args.T - K_s) / jnp.maximum(K_s, 1.0)
        w = 1.0 + (pos_w[:, None] - 1.0) * target
        loss = (bce * w).mean()
        tau = batch["tau"]
        aux = {}
        if args.sel_kl_weight > 0.0:
            li = logits[:, 1:-1] / jnp.maximum(tau, 1e-6)
            logp = jax.nn.log_softmax(li, axis=-1)
            p_ = jnp.exp(logp)
            kl = (p_ * (logp + math.log(max(1, args.T - 2)))).sum(-1).mean()
            loss = loss + args.sel_kl_weight * kl
            aux["kl"] = kl
        return loss, aux

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    init_cond = {"occ": jnp.asarray(batch0["occ"][:2]),
                 "start_goal": jnp.asarray(batch0["start_goal"][:2])}
    if args.use_sdf and "sdf" in batch0:
        init_cond["sdf"] = jnp.asarray(batch0["sdf"][:2])
    if args.use_level:
        init_cond["level"] = jnp.zeros((2, 1))
    params = model.init(jax.random.PRNGKey(args.seed), init_cond)["params"]
    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = init_train_state(params, tx, use_ema=False)
    start_step = 0
    if args.resume:
        path = (args.resume if os.path.exists(os.path.join(args.resume, "meta.json"))
                else latest_checkpoint(args.resume))
        if path:
            start_step, payload = load_checkpoint(path, params, state.opt_state)
            state = state._replace(
                step=jnp.asarray(start_step, jnp.int32), params=payload["params"],
                opt_state=payload.get("opt_state", state.opt_state),
            )
    state = replicate(state, mesh)
    train_step = make_train_step(loss_fn, tx, grad_accum=args.grad_accum)

    meta = {
        "stage": "selector", "T": args.T, "K": args.K,
        "d_model": args.d_model, "n_heads": args.n_heads, "d_ff": args.d_ff,
        "pos_dim": args.pos_dim, "n_layers": args.n_layers_sel,
        "use_sdf": args.use_sdf, "cond_start_goal": args.cond_start_goal,
        "use_sg_map": args.use_sg_map, "use_sg_token": args.use_sg_token,
        "use_goal_dist_token": args.use_goal_dist_token,
        "use_cond_bias": args.use_cond_bias, "cond_bias_mode": args.cond_bias_mode,
        "use_level": args.use_level, "level_mode": args.level_mode,
        "levels": args.levels, "k_schedule": args.k_schedule,
        "k_geom_gamma": args.k_geom_gamma, "sg_map_sigma": args.sg_map_sigma,
        "maze_channels": args.maze_channels,
        "maze_h": args.maze_h, "maze_w": args.maze_w,
    }
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "run_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta}, f, indent=2)

    rng = jax.random.PRNGKey(args.seed)
    batch = batch0
    t0 = time.time()
    with mesh:
        for step in range(start_step, args.steps):
            dev = {"occ": batch["occ"], "start_goal": batch["start_goal"]}
            if "sdf" in batch and args.use_sdf:
                dev["sdf"] = batch["sdf"]
            if has_levels:
                dev["kp_mask_levels"] = batch["kp_mask_levels"]
            else:
                dev["kp_idx"] = batch["kp_idx"]
            dev = shard_batch(dev, mesh)
            dev["tau"] = jnp.float32(anneal_tau(
                step, args.steps, args.sel_tau_start, args.sel_tau_end,
                args.sel_tau_frac, args.sel_tau_anneal,
            ))
            rng, k = jax.random.split(rng)
            state, metrics = train_step(state, dev, k)
            batch = next(loader)
            if step % args.log_every == 0:
                print(f"step {step} loss {float(metrics['loss']):.4f} "
                      f"| {args.batch*(step-start_step+1)/(time.time()-t0):.1f} samples/s")
            if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
                save_checkpoint(os.path.join(args.out_dir, f"ckpt_{step + 1}"),
                                state.params, state.opt_state, step + 1, None, meta)
    return state


if __name__ == "__main__":
    main()
