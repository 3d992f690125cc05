"""Stage-1-only sampler: DDIM keypoints + interpolation + plots.

Parity with reference src/sample/sample_keypoints.py (436 LoC): sample K
anchor positions with the keypoint DDPM, lerp to a full trajectory, report
metrics, and write per-sample PNG panels + samples.npz.
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.metrics import compute_metrics_batch
from ..models.loading import load_keypoint_model
from ..ops.ddpm import ddim_scan, make_timesteps
from ..ops.keyframes import interpolate_from_indices
from ..ops.normalize import logit_pos, sigmoid_pos
from ..ops.schedules import make_schedule
from ..train.batches import build_known_mask_values
from ..train.common import add_data_args, make_dataset, sample_idx_policy


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sample_keypoints (Stage-1 only, TPU)")
    p.add_argument("--kp_ckpt", type=str, required=True)
    p.add_argument("--use_ema", type=int, default=1)
    p.add_argument("--num_batches", type=int, default=2)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--ddim_steps", type=int, default=20)
    p.add_argument("--solver", type=str, default="ddim",
                   choices=["ddim", "pfdiff", "dpm"],
                   help="pfdiff: ~half the model evals on the same grid; "
                        "dpm: DPM-Solver++(2M) 2nd-order accuracy per eval")
    p.add_argument("--time_spacing", type=str, default="quadratic",
                   choices=["linear", "quadratic", "sqrt"],
                   help="DDIM spacing (reference sample_keypoints.py:32 "
                        "defaults to quadratic, like the e2e sampler)")
    p.add_argument("--kp_index_mode", type=str, default="uniform",
                   choices=["random", "uniform"])
    p.add_argument("--pos_clip", type=int, default=1)
    p.add_argument("--dphi_ckpt", type=str, default=None,
                   help="segment-cost ckpt for the kp_feat cost channels")
    p.add_argument("--sample_seed", type=int, default=1234)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--plots", type=int, default=1)
    p.add_argument("--max_plots", type=int, default=8)
    p.add_argument("--out_dir", type=str, default="runs/samples_kp")
    add_data_args(p)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    model, params, meta = load_keypoint_model(args.kp_ckpt, bool(args.bf16),
                                              bool(args.use_ema))
    T, K, D = int(meta["T"]), int(meta["K"]), int(meta["data_dim"])
    schedule = make_schedule(meta["schedule"], int(meta["N_train"]))
    times = jnp.asarray(make_timesteps(schedule.n_timesteps, args.ddim_steps,
                                       args.time_spacing))
    logit_space = bool(meta.get("logit_space", 0))

    kp_feat_dim = int(meta.get("kp_feat_dim", 0)) if meta.get("use_kp_feat") else 0
    dphi_fn = None
    if args.dphi_ckpt:
        from ..models.loading import make_dphi_seg_cost_fn

        dphi_fn, _ = make_dphi_seg_cost_fn(
            args.dphi_ckpt, T, meta.get("use_sdf"), bool(args.bf16))
    elif meta.get("kp_feat_dphi"):
        raise ValueError(
            "Stage-1 ckpt was trained with D_phi kp_feat cost channels — "
            "pass --dphi_ckpt (channels 3/4 would be off-distribution zeros)")

    @jax.jit
    def sample(key, idx, cond):
        B = idx.shape[0]
        if kp_feat_dim > 0:
            from ..ops.selection import build_kp_feat_full

            seg_cost = dphi_fn(cond, idx) if dphi_fn is not None else None
            cond = dict(cond)
            cond["kp_feat"] = build_kp_feat_full(idx, T, kp_feat_dim, seg_cost)
        known_mask, known_values = build_known_mask_values(
            idx, cond, D, T, bool(meta["clamp_endpoints"]))
        if logit_space:
            known_values = logit_pos(known_values)
        z = jax.random.normal(key, (B, K, D))
        z = jnp.where(known_mask, known_values, z)

        def eps_fn(z, t_b, **cache_kw):
            return model.apply({"params": params}, z, t_b, idx, known_mask,
                               cond, T, **cache_kw)

        def post(z):
            z = jnp.where(known_mask, known_values, z)
            if args.pos_clip:
                z = z.at[..., :2].set(jnp.clip(z[..., :2], 0.0, 1.0))
            return z

        if meta.get("objective", "eps") == "rf":
            from ..ops.rectified_flow import rf_integrate

            n_tr = schedule.n_timesteps

            def velocity_fn(z, t_cont):
                t_emb = (t_cont * (n_tr - 1)).astype(jnp.int32)
                return model.apply({"params": params}, z, t_emb, idx,
                                   known_mask, cond, T)

            z = rf_integrate(velocity_fn, z, args.ddim_steps, post=post)
        else:
            from ..ops.ddpm import run_solver

            z, _ = run_solver(args.solver, eps_fn, z, times, schedule,
                              post=post)
        if logit_space:
            z = sigmoid_pos(z)
        x = interpolate_from_indices(idx, z, T)
        return z, x

    args.T = T
    ds, _ = make_dataset(args)
    host_rng = np.random.RandomState(args.sample_seed)
    key = jax.random.PRNGKey(args.sample_seed)
    os.makedirs(args.out_dir, exist_ok=True)
    rows = []
    saved = {"keypoints": [], "interp": [], "idx": [], "gt": []}
    for bi in range(args.num_batches):
        batch = ds.get_batch(host_rng.randint(0, len(ds), size=args.batch))
        cond = {"occ": jnp.asarray(batch["occ"]),
                "start_goal": jnp.asarray(batch["start_goal"])}
        if "sdf" in batch and meta.get("use_sdf"):
            cond["sdf"] = jnp.asarray(batch["sdf"])
        idx = jnp.asarray(sample_idx_policy(
            host_rng, f"{args.kp_index_mode}:1.0", args.batch, T, K))
        key, k_b = jax.random.split(key)
        t0 = time.time()
        z, x = sample(k_b, idx, cond)
        m = compute_metrics_batch(cond["occ"], x, cond["start_goal"][:, 2:],
                                  jnp.asarray(batch["x"]))
        dt = time.time() - t0
        for b in range(args.batch):
            rows.append({"batch": bi, "sample": b,
                         **{k_: float(v[b]) for k_, v in m.items()}})
        saved["keypoints"].append(np.asarray(z))
        saved["interp"].append(np.asarray(x))
        saved["idx"].append(np.asarray(idx))
        saved["gt"].append(batch["x"])
        print(f"batch {bi}: {dt:.2f}s coll={float(m['collision_rate'].mean()):.4f} "
              f"mse={float(m['mse_to_gt'].mean()):.5f}")
        if bi == 0 and args.plots:
            from ..eval.visualize import save_sample_grid

            save_sample_grid(
                batch["occ"], {"interp": np.asarray(x), "gt": batch["x"]},
                os.path.join(args.out_dir, "samples.png"),
                start_goal=batch["start_goal"], max_samples=args.max_plots,
            )
    with open(os.path.join(args.out_dir, "metrics.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    summary = {k_: float(np.mean([r[k_] for r in rows])) for k_ in rows[0]
               if k_ not in ("batch", "sample")}
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    from ..utils.run_config import archive_evidence, write_run_config
    write_run_config(args.out_dir, args)
    archive_evidence(args.out_dir)
    np.savez_compressed(os.path.join(args.out_dir, "samples.npz"),
                        **{k_: np.concatenate(v) for k_, v in saved.items()})
    print("summary:", json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
