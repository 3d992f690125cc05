"""Oracle-DP keypoint diversity (reference diagnose_oracle_dp_wansynth.py).

Runs the exact oracle-cost DP over a batch of video latents and reports
anchor-index diversity (per-position histogram entropy, pairwise overlap) —
degenerate selections indicate the cost model or DP is broken.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..data.wan_synth import SyntheticWanDataset
from ..ops.oracle_segment_cost import build_oracle_seg_precompute, compute_oracle_cost_seg_mse
from ..ops.selection import build_cost_matrix_from_segments, dp_select_indices_batch


def main(argv=None):
    p = argparse.ArgumentParser("diagnose_oracle_dp")
    p.add_argument("--T", type=int, default=21)
    p.add_argument("--K", type=int, default=5)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--latent_c", type=int, default=16)
    p.add_argument("--latent_h", type=int, default=12)
    p.add_argument("--latent_w", type=int, default=12)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_json", type=str, default=None)
    args = p.parse_args(argv)

    ds = SyntheticWanDataset(n_samples=args.batch, T=args.T, C=args.latent_c,
                             H=args.latent_h, W=args.latent_w, text_len=4,
                             text_dim=8, seed=args.seed)
    z = jnp.asarray(ds.get_batch(np.arange(args.batch))["latents"])
    z = z.reshape(args.batch, args.T, -1)
    pre = build_oracle_seg_precompute(args.T)
    cost = compute_oracle_cost_seg_mse(z, pre, normalize=False)
    C = build_cost_matrix_from_segments(cost, pre, args.T)
    idx = np.asarray(dp_select_indices_batch(C, args.K))

    hist = np.zeros(args.T)
    for row in idx:
        hist[row] += 1
    probs = hist / hist.sum()
    nz = probs[probs > 0]
    entropy = float(-(nz * np.log(nz)).sum())
    # pairwise overlap of anchor sets
    sets = [set(map(int, r)) for r in idx]
    overlaps = [len(sets[i] & sets[j]) / args.K
                for i in range(len(sets)) for j in range(i + 1, len(sets))]
    report = {
        "index_entropy": entropy,
        "max_entropy": float(np.log(args.T)),
        "mean_pairwise_overlap": float(np.mean(overlaps)),
        "unique_index_positions": int((hist > 0).sum()),
        "histogram": hist.astype(int).tolist(),
    }
    out = json.dumps(report, indent=2)
    print(out)
    if args.out_json:
        with open(args.out_json, "w") as f:
            f.write(out)
    return report


if __name__ == "__main__":
    main()
