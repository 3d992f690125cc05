"""Stage-2 nested-mask statistics (reference scripts/diagnose_stage2_masks.py).

Reports per-level anchor counts, gap histograms, and nestedness violations
for each mask policy, as the oracle check that corruption matches training
assumptions.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.keyframes import (
    build_nested_masks_batch,
    build_nested_masks_from_base,
    compute_k_schedule,
    sample_fixed_k_indices_uniform_batch,
)


def main(argv=None):
    p = argparse.ArgumentParser("diagnose_stage2_masks")
    p.add_argument("--T", type=int, default=64)
    p.add_argument("--K_min", type=int, default=8)
    p.add_argument("--levels", type=int, default=3)
    p.add_argument("--k_schedule", type=str, default="doubling")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_json", type=str, default=None)
    args = p.parse_args(argv)

    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    report = {"k_list": compute_k_schedule(args.T, args.K_min, args.levels,
                                           args.k_schedule)}
    for policy in ("random_nested", "uniform_base"):
        if policy == "random_nested":
            masks, _ = build_nested_masks_batch(
                k1, args.batch, args.T, args.K_min, args.levels,
                k_schedule=args.k_schedule)
        else:
            idx, _ = sample_fixed_k_indices_uniform_batch(
                k2, args.batch, args.T, args.K_min)
            masks, _ = build_nested_masks_from_base(
                k3, idx, args.T, args.levels, k_schedule=args.k_schedule)
        m = np.asarray(masks)
        stats = {}
        violations = 0
        for s in range(args.levels + 1):
            counts = m[:, s].sum(1)
            pos = [np.where(row)[0] for row in m[:, s]]
            gaps = np.concatenate([np.diff(pp) for pp in pos])
            stats[f"level_{s}"] = {
                "count_mean": float(counts.mean()),
                "count_std": float(counts.std()),
                "gap_mean": float(gaps.mean()),
                "gap_max": int(gaps.max()),
            }
            if s >= 1:
                violations += int((m[:, s] & ~m[:, s - 1]).sum())
        stats["nestedness_violations"] = violations
        report[policy] = stats
    out = json.dumps(report, indent=2)
    print(out)
    if args.out_json:
        with open(args.out_json, "w") as f:
            f.write(out)
    return report


if __name__ == "__main__":
    main()
