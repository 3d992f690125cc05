"""Export scalars.jsonl metric curves to PNGs.

Parity with reference scripts/plot_tensorboard_scalars.py (TB scalar → PNG
export) over the framework's jsonl sink.
"""
from __future__ import annotations

import argparse
import collections
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    p = argparse.ArgumentParser("plot_scalars")
    p.add_argument("--log_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--tags", type=str, default=None, help="comma-separated filter")
    args = p.parse_args()
    path = os.path.join(args.log_dir, "scalars.jsonl")
    series = collections.defaultdict(lambda: ([], []))
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            xs, ys = series[rec["tag"]]
            xs.append(rec["step"])
            ys.append(rec["value"])
    tags = args.tags.split(",") if args.tags else list(series)
    out_dir = args.out_dir or args.log_dir
    os.makedirs(out_dir, exist_ok=True)
    for tag in tags:
        if tag not in series:
            continue
        xs, ys = series[tag]
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(xs, ys, lw=1)
        ax.set_xlabel("step")
        ax.set_title(tag)
        ax.grid(alpha=0.3)
        out = os.path.join(out_dir, tag.replace("/", "_") + ".png")
        fig.tight_layout()
        fig.savefig(out, dpi=110)
        plt.close(fig)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
