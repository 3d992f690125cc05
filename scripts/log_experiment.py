"""Append a structured experiment record to notes/PROJECT_LOG.md.

Parity with reference scripts/log_experiment.sh (:1-40): git state, settings,
auto-summarized results (summary.json / metrics.csv) — the lab notebook is
part of the system.

Usage:
  python scripts/log_experiment.py --title "stage2 ablation" \
      --run_dir runs/il --results runs/samples/summary.json --notes "..."
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time


def _git(repo, *argv):
    try:
        return subprocess.run(["git", *argv], cwd=repo, capture_output=True,
                              text=True, timeout=5).stdout.strip()
    except Exception:
        return "?"


def main():
    p = argparse.ArgumentParser("log_experiment")
    p.add_argument("--title", type=str, required=True)
    p.add_argument("--run_dir", type=str, default=None)
    p.add_argument("--results", type=str, default=None,
                   help="summary.json or metrics.csv to summarize")
    p.add_argument("--notes", type=str, default="")
    p.add_argument("--log_path", type=str, default="notes/PROJECT_LOG.md")
    args = p.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lines = [
        f"\n## {time.strftime('%Y-%m-%d %H:%M')} — {args.title}\n",
        f"- git: `{_git(repo, 'rev-parse', '--short', 'HEAD')}`"
        f"{' (dirty)' if _git(repo, 'status', '--porcelain') else ''}",
        f"- cmd: `{' '.join(sys.argv[1:])}`",
    ]
    if args.run_dir:
        rc = os.path.join(args.run_dir, "run_config.json")
        if os.path.exists(rc):
            with open(rc) as f:
                cfg = json.load(f)
            a = cfg.get("args", {})
            keys = [k for k in ("T", "K", "K_min", "levels", "steps", "batch",
                                "lr", "mode") if k in a]
            lines.append("- settings: " + ", ".join(f"{k}={a[k]}" for k in keys))
    if args.results and os.path.exists(args.results):
        if args.results.endswith(".json"):
            with open(args.results) as f:
                summary = json.load(f)
            lines.append("- results:")
            for k, v in summary.items():
                lines.append(f"  - {k}: {v:.5f}" if isinstance(v, float)
                             else f"  - {k}: {v}")
        elif args.results.endswith(".csv"):
            with open(args.results) as f:
                rows = list(csv.DictReader(f))
            if rows:
                num_cols = [c for c in rows[0]
                            if c not in ("batch", "sample")]
                lines.append(f"- results ({len(rows)} rows):")
                for c in num_cols:
                    try:
                        vals = [float(r[c]) for r in rows]
                        lines.append(f"  - mean {c}: {sum(vals)/len(vals):.5f}")
                    except ValueError:
                        pass
    if args.notes:
        lines.append(f"- notes: {args.notes}")

    log_path = os.path.join(repo, args.log_path)
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    if not os.path.exists(log_path):
        with open(log_path, "w") as f:
            f.write("# PROJECT LOG\n")
    with open(log_path, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"logged to {log_path}")


if __name__ == "__main__":
    main()
