"""Offline DP keypoint preparation: costs → DP indices (+levels) → npz.

Parity with reference src/data/prepare_dp_keypoints.py: per-sample segment
costs from ground truth (SNR-weighted interp-MSE) or a trained D_phi
checkpoint, DP shortest-path selection of K anchors, optional per-level DP
masks (`kp_mask_levels`, one DP run per level K_s), kp features, all written
into a prepared npz next to the raw data.

Runs batched on the accelerator: cost precompute + DP are fully vectorized
(ops/selection.py), so preparing 100k samples is a few jit calls per batch.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.selector import SegmentCostPredictor
from ..ops.keyframes import compute_k_schedule
from ..ops.selection import (
    build_cost_matrix_from_segments,
    build_kp_feat_batch,
    build_segment_features,
    build_segment_precompute,
    build_snr_weights,
    compute_segment_costs_batch,
    sample_timesteps_log_snr,
)
from ..utils.checkpoint import latest_checkpoint, load_checkpoint, read_meta
from .dataset import ParticleMazeDataset


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("prepare_dp_keypoints (TPU)")
    p.add_argument("--out_path", type=str, required=True)
    p.add_argument("--prepared_path", type=str, default=None,
                   help="annotate an EXISTING prepared npz (e.g. the d4rl.py "
                        "output) with DP keypoint fields instead of "
                        "generating particle-maze data — the reference's "
                        "d4rl unified pipeline route")
    p.add_argument("--T", type=int, default=64)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--num_samples", type=int, default=10000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--maze_h", type=int, default=21)
    p.add_argument("--maze_w", type=int, default=21)
    p.add_argument("--with_velocity", type=int, default=0)
    p.add_argument("--use_sdf", type=int, default=0)
    p.add_argument("--data_seed", type=int, default=123)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--cost_source", type=str, default="gt", choices=["gt", "dphi"])
    p.add_argument("--dphi_ckpt", type=str, default=None)
    p.add_argument("--segment_cost_samples", type=int, default=16)
    p.add_argument("--snr_schedule", type=str, default="cosine")
    p.add_argument("--snr_N_train", type=int, default=1000)
    p.add_argument("--snr_min", type=float, default=0.1)
    p.add_argument("--snr_max", type=float, default=10.0)
    p.add_argument("--snr_gamma", type=float, default=1.0)
    p.add_argument("--t_steps", type=int, default=16)
    p.add_argument("--store_kp_mask_levels", type=int, default=0)
    p.add_argument("--levels", type=int, default=3)
    p.add_argument("--k_schedule", type=str, default="doubling")
    p.add_argument("--k_geom_gamma", type=float, default=None)
    return p


def _load_dphi(path: str, bf16: bool = False):
    path = path if os.path.exists(os.path.join(path, "meta.json")) else latest_checkpoint(path)
    _, meta = read_meta(path)
    model = SegmentCostPredictor(
        d_cond=meta["d_cond"], seg_feat_dim=meta["seg_feat_dim"],
        hidden_dim=meta["hidden_dim"], n_layers=meta["n_layers"],
        use_sdf=bool(meta["use_sdf"]), use_start_goal=bool(meta["cond_start_goal"]),
        maze_channels=tuple(int(c) for c in meta["maze_channels"].split(",")),
    )
    cond0 = {"occ": jnp.zeros((1, 1, meta["maze_h"], meta["maze_w"])),
             "start_goal": jnp.zeros((1, 4))}
    if meta.get("use_sdf"):
        cond0["sdf"] = jnp.zeros((1, 1, meta["maze_h"], meta["maze_w"]))
    tmpl = model.init(jax.random.PRNGKey(0), cond0, jnp.zeros((1, 3)))["params"]
    _, payload = load_checkpoint(path, tmpl)
    return model, payload["params"], meta


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.prepared_path:
        from .dataset import PreparedTrajectoryDataset

        ds = PreparedTrajectoryDataset(args.prepared_path)
        if ds.T != args.T:
            raise ValueError(f"--T {args.T} != prepared T {ds.T}")
        if args.use_sdf and "sdf" not in ds.arrays:
            raise ValueError("--use_sdf 1 but prepared npz has no sdf")
    else:
        ds = ParticleMazeDataset(
            num_samples=args.num_samples, h=args.maze_h, w=args.maze_w, T=args.T,
            with_velocity=bool(args.with_velocity), use_sdf=bool(args.use_sdf),
            cache_dir=args.cache_dir, seed=args.data_seed,
        )
    precomp = build_segment_precompute(args.T, args.segment_cost_samples)
    seg_feat = build_segment_features(args.T, precomp.seg_i, precomp.seg_j)
    snr, weights = build_snr_weights(
        args.snr_schedule, args.snr_N_train, args.snr_min, args.snr_max, args.snr_gamma
    )
    t_idx = sample_timesteps_log_snr(snr, args.t_steps)
    weight_scale = float(np.asarray(weights)[t_idx].sum())

    dphi = None
    if args.cost_source == "dphi":
        if not args.dphi_ckpt:
            raise ValueError("--dphi_ckpt required for cost_source=dphi")
        dphi = _load_dphi(args.dphi_ckpt)

    k_list = compute_k_schedule(args.T, args.K, args.levels, args.k_schedule, args.k_geom_gamma)

    @jax.jit
    def costs_gt(x):
        return compute_segment_costs_batch(x, precomp, weight_scale)

    def costs_dphi(cond):
        model, params, meta = dphi
        pred = model.apply({"params": params}, cond, seg_feat)
        if meta.get("normalize_targets"):
            pred = pred * meta["target_std"] + meta["target_mean"]
        return pred

    from ..ops.selection import dp_select_indices_batch

    dp_k = jax.jit(lambda C: dp_select_indices_batch(C, args.K))
    dp_levels = {
        int(K_s): jax.jit(lambda C, K_s=int(K_s): dp_select_indices_batch(C, K_s))
        for K_s in sorted(set(k_list))
    }

    all_x, all_occ, all_sg, all_sdf = [], [], [], []
    all_idx, all_feat, all_levels = [], [], []
    n = len(ds)
    for lo in range(0, n, args.batch):
        idxs = np.arange(lo, min(n, lo + args.batch))
        batch = ds.get_batch(idxs)
        x = jnp.asarray(batch["x"])
        if args.cost_source == "gt":
            cost = costs_gt(x)
        else:
            cond = {"occ": jnp.asarray(batch["occ"]),
                    "start_goal": jnp.asarray(batch["start_goal"])}
            if args.use_sdf:
                cond["sdf"] = jnp.asarray(batch["sdf"])
            cost = costs_dphi(cond)
        C = build_cost_matrix_from_segments(cost, precomp, args.T)
        kp_idx = dp_k(C)
        all_idx.append(np.asarray(kp_idx))
        all_feat.append(np.asarray(build_kp_feat_batch(kp_idx, args.T)))
        if args.store_kp_mask_levels:
            masks = np.zeros((len(idxs), args.levels + 1, args.T), dtype=bool)
            for s in range(args.levels + 1):
                idx_s = np.asarray(dp_levels[int(k_list[s])](C))
                masks[np.arange(len(idxs))[:, None], s, idx_s] = True
            all_levels.append(masks)
        all_x.append(batch["x"])
        all_occ.append(batch["occ"])
        all_sg.append(batch["start_goal"])
        if args.use_sdf:
            all_sdf.append(batch["sdf"])
        print(f"prepared {min(n, lo + args.batch)}/{n}")

    out = {
        "x": np.concatenate(all_x),
        "occ": np.concatenate(all_occ),
        "start_goal": np.concatenate(all_sg),
        "kp_idx": np.concatenate(all_idx),
        "kp_feat": np.concatenate(all_feat),
    }
    if args.use_sdf:
        out["sdf"] = np.concatenate(all_sdf)
    if args.store_kp_mask_levels:
        out["kp_mask_levels"] = np.concatenate(all_levels)
    os.makedirs(os.path.dirname(os.path.abspath(args.out_path)), exist_ok=True)
    np.savez_compressed(args.out_path, **out)
    with open(args.out_path + ".json", "w") as f:
        json.dump({"args": vars(args), "k_list": k_list}, f, indent=2)
    print(f"wrote {args.out_path}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
