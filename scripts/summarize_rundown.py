"""Format the TPU rundown's outputs into RESULTS.md-ready tables.

Reads runs/tpu_rundown logs + runs/d4rl_r2 sample summaries and prints the
markdown tables for (a) the D4RL T=128 winning-recipe comparison (VERDICT
item 3), (b) the sampling-variant sweep (selector / fora / best-of), and
(c) the idx-mix ablation (item 4). Run after scripts/tpu_rundown.sh.
"""
from __future__ import annotations

import json
import pathlib
import sys

BASE = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "runs/d4rl_r2")


def load(p):
    p = pathlib.Path(p)
    return json.loads(p.read_text()) if p.is_file() else None


def row(name, s):
    if not s:
        return f"| {name} | — | — | — |"
    return (f"| {name} | {s['interp_collision_rate']:.4f} / "
            f"{s['refined_collision_rate']:.4f} | "
            f"{s['interp_mse_to_gt']:.5f} / {s['refined_mse_to_gt']:.5f} | "
            f"{s.get('samples_per_sec', float('nan')):.2f} |")


def main():
    print(f"## D4RL T=128 unified (winning recipe, {BASE})\n")
    print("| Sampling | Collision (interp / refined) | MSE-to-GT | samples/s |")
    print("|---|---|---|---|")
    variants = [
        ("uniform idx (reference smallnoise recipe)", BASE / "samples/summary.json"),
        ("selector idx", BASE / "samples_selector/summary.json"),
        ("uniform + FORA cache 2", BASE / "samples_fora2/summary.json"),
        ("dp-16 anchor search + cache 2", BASE / "samples_bestof16/summary.json"),
    ]
    for name, p in variants:
        print(row(name, load(p)))
    s = load(BASE / "samples/summary.json")
    if s and "oracle_interp_collision_rate" in s:
        print(f"| oracle anchors (same run) | "
              f"{s['oracle_interp_collision_rate']:.4f} / "
              f"{s['oracle_refined_collision_rate']:.4f} | "
              f"{s['oracle_interp_mse_to_gt']:.5f} / "
              f"{s['oracle_refined_mse_to_gt']:.5f} | — |")

    print("\n## Stage-1 idx-mix ablation (same Stage-2)\n")
    print("| Mix | Collision (interp / refined) | oracle refined |")
    print("|---|---|---|")
    for d in sorted(BASE.glob("ablate_kp_*/samples/summary.json")):
        s = json.loads(d.read_text())
        name = d.parent.parent.name.replace("ablate_kp_", "")
        print(f"| {name} | {s['interp_collision_rate']:.4f} / "
              f"{s['refined_collision_rate']:.4f} | "
              f"{s.get('oracle_refined_collision_rate', float('nan')):.4f} |")

    for name in ("bench", "kernels"):
        p = pathlib.Path(f"runs/tpu_rundown/{name}.log")
        if p.is_file():
            tail = p.read_text().strip().splitlines()[-1:]
            print(f"\n{name}: {tail[0] if tail else '(empty)'}")


if __name__ == "__main__":
    main()
