"""Re-render sample plots from a saved samples.npz (no model needed).

Parity with the reference's npz rerender script (SURVEY.md §2.7): takes the
sampler's samples.npz (now carrying occ/start_goal alongside trajectories)
and regenerates per-sample PNG overlays.

    python scripts/rerender_npz.py --npz runs/.../samples.npz --out plots/ -n 8
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interpolated_diffusion_tpu.eval.visualize import (  # noqa: E402
    plot_occupancy_trajectories,
)


def main(argv=None):
    p = argparse.ArgumentParser("rerender_npz")
    p.add_argument("--npz", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("-n", "--num", type=int, default=8)
    p.add_argument("--flip_y", type=int, default=0)
    args = p.parse_args(argv)

    f = np.load(args.npz)
    if "occ" not in f.files:
        raise SystemExit(
            "samples.npz has no 'occ' — regenerate with a current sampler "
            f"(found keys: {f.files})")
    os.makedirs(args.out, exist_ok=True)
    n = min(args.num, f["interp"].shape[0])
    for b in range(n):
        trajs, labels = [], []
        for key in ("gt", "interp", "refined"):
            if key in f.files:
                trajs.append(f[key][b])
                labels.append(key)
        plot_occupancy_trajectories(
            f["occ"][b], trajs, labels=labels,
            keypoints=f["keypoints"][b] if "keypoints" in f.files else None,
            start_goal=f["start_goal"][b] if "start_goal" in f.files else None,
            out_path=os.path.join(args.out, f"sample_{b:03d}.png"),
            flip_y=bool(args.flip_y), title=f"sample {b}",
        )
    print(f"rendered {n} plots -> {args.out}")


if __name__ == "__main__":
    main()
