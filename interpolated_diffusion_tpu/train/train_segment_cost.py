"""D_phi segment-cost predictor trainer.

Parity with reference src/train/train_segment_cost.py: SNR-weighted GT
segment costs (log-SNR-subsampled timesteps, clipped-SNR^gamma weight scale)
as regression targets, optional target normalization from a dataset subset.
The whole step (target computation + fwd/bwd) is one jitted program.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.selector import SegmentCostPredictor
from ..ops.selection import (
    build_segment_features,
    build_segment_precompute,
    build_snr_weights,
    compute_segment_costs_batch,
    sample_timesteps_log_snr,
)
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .common import add_data_args, add_train_args, make_dataset, make_loader
from .state import init_train_state, make_optimizer, make_train_step


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_segment_cost (D_phi, TPU)")
    p.add_argument("--T", type=int, default=64)
    p.add_argument("--d_cond", type=int, default=128)
    p.add_argument("--seg_feat_dim", type=int, default=3)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--n_layers_mlp", type=int, default=3)
    p.add_argument("--maze_channels", type=str, default="32,64,128,128")
    p.add_argument("--cond_start_goal", type=int, default=1)
    p.add_argument("--segment_cost_samples", type=int, default=16)
    p.add_argument("--snr_schedule", type=str, default="cosine", choices=["cosine", "linear"])
    p.add_argument("--snr_N_train", type=int, default=1000)
    p.add_argument("--snr_min", type=float, default=0.1)
    p.add_argument("--snr_max", type=float, default=10.0)
    p.add_argument("--snr_gamma", type=float, default=1.0)
    p.add_argument("--t_steps", type=int, default=16)
    p.add_argument("--normalize_targets", type=int, default=1)
    p.add_argument("--stats_subset", type=int, default=512)
    add_data_args(p)
    add_train_args(p)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    ds, data_dim = make_dataset(args)
    loader = iter(make_loader(ds, args))

    snr, weights = build_snr_weights(
        args.snr_schedule, args.snr_N_train, args.snr_min, args.snr_max, args.snr_gamma
    )
    t_idx = sample_timesteps_log_snr(snr, args.t_steps)
    weight_scale = float(np.asarray(weights)[t_idx].sum())
    precomp = build_segment_precompute(args.T, args.segment_cost_samples)
    seg_feat = build_segment_features(args.T, precomp.seg_i, precomp.seg_j)

    target_mean, target_std = 0.0, 1.0
    if args.normalize_targets:
        rng = np.random.RandomState(123)
        sub = rng.randint(0, len(ds), size=min(len(ds), args.stats_subset))
        xb = jnp.asarray(ds.get_batch(sub)["x"])
        costs = compute_segment_costs_batch(xb, precomp, weight_scale)
        target_mean = float(costs.mean())
        target_std = max(1e-6, float(costs.std()))

    model = SegmentCostPredictor(
        d_cond=args.d_cond, seg_feat_dim=args.seg_feat_dim,
        hidden_dim=args.hidden_dim, n_layers=args.n_layers_mlp,
        use_sdf=bool(args.use_sdf), use_start_goal=bool(args.cond_start_goal),
        maze_channels=tuple(int(c) for c in args.maze_channels.split(",")),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    def loss_fn(params, batch, rng):
        cond = {"occ": batch["occ"], "start_goal": batch["start_goal"]}
        if "sdf" in batch:
            cond["sdf"] = batch["sdf"]
        target = compute_segment_costs_batch(batch["x"], precomp, weight_scale)
        if args.normalize_targets:
            target = (target - target_mean) / target_std
        target = jax.lax.stop_gradient(target)
        pred = model.apply({"params": params}, cond, seg_feat)
        return jnp.mean((pred - target) ** 2), {}

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    batch0 = next(loader)
    cond0 = {"occ": jnp.asarray(batch0["occ"][:2]),
             "start_goal": jnp.asarray(batch0["start_goal"][:2])}
    if "sdf" in batch0:
        cond0["sdf"] = jnp.asarray(batch0["sdf"][:2])
    params = model.init(jax.random.PRNGKey(args.seed), cond0, seg_feat)["params"]
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
        "stage": "segment_cost", "T": args.T, "d_cond": args.d_cond,
        "seg_feat_dim": args.seg_feat_dim, "hidden_dim": args.hidden_dim,
        "n_layers": args.n_layers_mlp, "use_sdf": args.use_sdf,
        "cond_start_goal": args.cond_start_goal,
        "snr_schedule": args.snr_schedule, "snr_N_train": args.snr_N_train,
        "snr_min": args.snr_min, "snr_max": args.snr_max, "snr_gamma": args.snr_gamma,
        "t_steps": args.t_steps, "t_idx": np.asarray(t_idx).tolist(),
        "weight_scale": weight_scale,
        "segment_cost_samples": args.segment_cost_samples,
        "maze_channels": args.maze_channels,
        "normalize_targets": args.normalize_targets,
        "target_mean": target_mean, "target_std": target_std,
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
            dev = {"x": batch["x"], "occ": batch["occ"], "start_goal": batch["start_goal"]}
            if "sdf" in batch and args.use_sdf:
                dev["sdf"] = batch["sdf"]
            dev = shard_batch(dev, mesh)
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
