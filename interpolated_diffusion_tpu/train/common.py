"""Shared trainer plumbing: datasets from args, host-side index policies,
meta construction, checkpoint cadence.

Mirrors the reference's cross-trainer conventions: int-as-bool flags,
"name:weight" policy mixes (train_keypoints.py:145-173), meta-rich
checkpoints (§5.4), per-run seeding.
"""
from __future__ import annotations

import argparse
from typing import Dict, Optional, Tuple

import numpy as np

from ..data.dataset import BatchLoader, ParticleMazeDataset, PreparedTrajectoryDataset
from .batches import parse_policy_mix


def add_data_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataset", type=str, default="particle", choices=["particle", "prepared"])
    p.add_argument("--prepared_path", type=str, default=None)
    p.add_argument("--num_samples", type=int, default=100000)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--maze_h", type=int, default=21)
    p.add_argument("--maze_w", type=int, default=21)
    p.add_argument("--with_velocity", type=int, default=0)
    p.add_argument("--use_sdf", type=int, default=0)
    p.add_argument("--data_seed", type=int, default=123)


def add_train_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--use_ema", type=int, default=1)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/out")
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--n_data_shards", type=int, default=None,
                   help="DP width; defaults to all local devices")
    p.add_argument("--steps_per_call", type=int, default=10,
                   help="train steps per jit dispatch (lax.scan superbatch); "
                        "amortizes host->device transfer latency")


def make_dataset(args) -> Tuple[object, int]:
    """Returns (dataset, data_dim)."""
    if args.dataset == "prepared":
        if not args.prepared_path:
            raise ValueError("--prepared_path required for --dataset prepared")
        ds = PreparedTrajectoryDataset(args.prepared_path)
        return ds, ds.data_dim
    ds = ParticleMazeDataset(
        num_samples=args.num_samples,
        h=args.maze_h,
        w=args.maze_w,
        T=args.T,
        with_velocity=bool(args.with_velocity),
        use_sdf=bool(args.use_sdf),
        cache_dir=args.cache_dir,
        seed=args.data_seed,
    )
    return ds, ds.data_dim


def make_loader(ds, args) -> BatchLoader:
    return BatchLoader(ds, batch_size=args.batch, seed=args.seed)


def sample_idx_policy(
    rng: np.random.RandomState,
    policy_mix: str,
    B: int,
    T: int,
    K: int,
    kp_idx: Optional[np.ndarray] = None,
    uniform_jitter: float = 0.0,
    selector_idx: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Host-side anchor-index sampling with per-sample policy mixing.

    Policies: random (sorted random interior + endpoints), uniform (evenly
    spaced, optional jitter), dp (precomputed kp_idx from the dataset),
    selector (indices produced by a learned selector, passed in).
    """
    mix = parse_policy_mix(policy_mix) or [("random", 1.0)]
    names = [n for n, _ in mix]
    probs = np.asarray([w for _, w in mix])
    choice = rng.choice(len(names), size=B, p=probs)
    idx = np.zeros((B, K), dtype=np.int32)
    for b in range(B):
        name = names[choice[b]]
        if name == "dp" and kp_idx is not None:
            idx[b] = kp_idx[b][:K]
        elif name == "selector" and selector_idx is not None:
            idx[b] = selector_idx[b][:K]
        elif name == "uniform":
            base = np.linspace(0, T - 1, K)
            if uniform_jitter > 0 and K > 2:
                spacing = (T - 1) / (K - 1)
                noise = (rng.rand(K) - 0.5) * spacing * uniform_jitter
                noise[0] = noise[-1] = 0.0
                base = base + noise
            row = np.clip(np.round(base).astype(np.int64), 0, T - 1)
            for k in range(1, K):
                row[k] = max(row[k], row[k - 1] + 1)
            for k in range(K - 2, -1, -1):
                row[k] = min(row[k], row[k + 1] - 1)
            row = np.clip(row, 0, T - 1)
            row[0], row[-1] = 0, T - 1
            idx[b] = row
        else:  # random
            interior = rng.choice(np.arange(1, T - 1), size=K - 2, replace=False)
            idx[b] = np.sort(np.concatenate([[0], interior, [T - 1]]))
    return idx
