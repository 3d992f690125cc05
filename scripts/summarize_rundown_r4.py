"""Format the round-4 TPU rundown outputs into RESULTS.md-ready tables.

Round-4 layout (scripts/tpu_rundown_r4.sh): the boot16 Stage-2 A/B grid
{il, il_boot16} x {level-noise dp-best-of-16, uniform+softclamp} under
runs/d4rl_r4, the idx-mix ablation arms, the wansynth_tiny Stage-2 eval,
the maze_q10k refresh, and the serving sweep. Prints markdown; run any
time — missing steps print as '—'.
"""
from __future__ import annotations

import json
import pathlib

BASE = pathlib.Path("runs/d4rl_r4")
LOG = pathlib.Path("runs/tpu_rundown_r4")


def load(p):
    p = pathlib.Path(p)
    try:
        return json.loads(p.read_text()) if p.is_file() else None
    except ValueError:
        return None


def row(name, s, oracle=False):
    if not s:
        return f"| {name} | — | — | — |"
    pre = "oracle_" if oracle else ""
    return (f"| {name} | {s[pre + 'interp_collision_rate']:.4f} / "
            f"{s[pre + 'refined_collision_rate']:.4f} | "
            f"{s[pre + 'interp_mse_to_gt']:.5f} / "
            f"{s[pre + 'refined_mse_to_gt']:.5f} | "
            f"{s[pre + 'interp_smoothness']:.5f} / "
            f"{s[pre + 'refined_smoothness']:.5f} |")


def main():
    print("## D4RL T=128: Stage-2 boot16 A/B grid (round-4 gate)\n")
    print("| Stage-2 x sampling | Collision (interp / refined) | "
          "MSE-to-GT | Smoothness |")
    print("|---|---|---|---|")
    grid = [
        ("il, level-noise (r3 headline sampler)", BASE / "samples/summary.json"),
        ("il, dp best-of-16 + level-noise", BASE / "samples_bestof16/summary.json"),
        ("il, dp best-of-16 + softclamp",
         BASE / "samples_bestof16_softclamp/summary.json"),
        ("il, uniform + softclamp", BASE / "samples_uniform_il/summary.json"),
        ("il_boot16, dp best-of-16 + level-noise",
         BASE / "samples_bestof16_boot16/summary.json"),
        ("il_boot16, dp best-of-16 + softclamp",
         BASE / "samples_bestof16_boot16_softclamp/summary.json"),
        ("il_boot16, uniform + softclamp",
         BASE / "samples_uniform_boot16/summary.json"),
    ]
    for name, p in grid:
        print(row(name, load(p)))
    s = load(BASE / "samples/summary.json")
    if s and "oracle_interp_collision_rate" in s:
        print(row("il, oracle anchors (same run)", s, oracle=True))

    print("\n## Stage-1 idx-mix ablation (same Stage-2)\n")
    print("| Mix | Collision (interp / refined) | MSE-to-GT | Smoothness |")
    print("|---|---|---|---|")
    for d in sorted(BASE.glob("ablate_kp_*/samples/summary.json")):
        name = d.parent.parent.name.replace("ablate_kp_", "")
        print(row(name, load(d)))

    print("\n## Maze T=64 quality refresh (maze_q10k)\n")
    print("| Sampling | Collision (interp / refined) | MSE-to-GT | Smoothness |")
    print("|---|---|---|---|")
    for name, p in [
        ("uniform, clamp all_anchors", "runs/maze_q10k/samples_uniform/summary.json"),
        ("dp best-of-16", "runs/maze_q10k/samples_bestof16/summary.json"),
    ]:
        print(row(name, load(p)))

    wt = load("runs/wansynth_tiny/eval_stage2/summary.json")
    if wt:
        print("\n## wansynth_tiny Stage-2 eval\n")
        print(json.dumps(wt, indent=1))

    sv = load(LOG / "serving_sweep_r4.json")
    if sv and sv.get("best"):
        print("\n## Serving sweep best point\n")
        print(json.dumps(sv["best"], indent=1))

    prof = load("docs/profile_smallL.json")
    if prof:
        print("\n## Small-L attention component profile (close-out)\n")
        print(json.dumps({k: v for k, v in prof.items()}, indent=1))

    for name in ("bench_r4", "kernels_r4"):
        p = LOG / f"{name}.log"
        if p.is_file():
            tail = p.read_text().strip().splitlines()[-1:]
            print(f"\n{name}: {tail[0] if tail else '(empty)'}")


if __name__ == "__main__":
    main()
