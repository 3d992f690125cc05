"""Format the round-5 TPU rundown outputs into RESULTS.md-ready tables.

Round-5 layout (scripts/tpu_rundown_r5b.sh + _r5c.sh): the equal-budget
boot16-10k A/B grid under runs/d4rl_r5, the conf-override / delta-smooth
knob cells, the idx-mix ablation arms (first data after four dataless
rounds), the wansynth_tiny trained-scale eval, the maze_q10k refresh, the
serving sweep, and the on-chip small-L profile. Prints markdown; missing
steps print as '—'; honest markers (scripts/rundown_lib.sh) mean a step
listed as done really ran (rc=0 recorded in the marker).
"""
from __future__ import annotations

import json
import pathlib

B4 = pathlib.Path("runs/d4rl_r4")
R5 = pathlib.Path("runs/d4rl_r5")
LOG = pathlib.Path("runs/tpu_rundown_r5")


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

    def g(k, fmt):
        v = s.get(pre + k)
        return (fmt % v) if v is not None else "—"

    return (f"| {name} | {g('interp_collision_rate', '%.4f')} / "
            f"{g('refined_collision_rate', '%.4f')} | "
            f"{g('interp_mse_to_gt', '%.5f')} / "
            f"{g('refined_mse_to_gt', '%.5f')} | "
            f"{g('interp_smoothness', '%.5f')} / "
            f"{g('refined_smoothness', '%.5f')} |")


def marker_state(name):
    done = LOG / f"{name}.done"
    cut = LOG / f"{name}.cut"
    failed = LOG / f"{name}.failed"
    if done.is_file() and done.stat().st_size > 0:
        return "done"
    if cut.is_file():
        return f"CUT: {cut.read_text().strip()}"
    if failed.is_file():
        return "FAILED"
    return "not run"


def main():
    print("## D4RL T=128: equal-budget boot16-10k grid (round-5 gate)\n")
    print("| Stage-2 x sampling | Collision (interp / refined) | "
          "MSE-to-GT | Smoothness |")
    print("|---|---|---|---|")
    grid = [
        ("il_boot16@10k, bestof16 + level-noise",
         R5 / "samples_bestof16_boot16/summary.json"),
        ("il_boot16@10k, bestof16 + softclamp",
         R5 / "samples_bestof16_boot16_softclamp/summary.json"),
        ("il_boot16@10k, uniform + softclamp",
         R5 / "samples_uniform_boot16/summary.json"),
        ("il_boot16@10k, bestof16+sc + conf0.5",
         R5 / "samples_b16sc_conf05/summary.json"),
        ("il_boot16@10k, bestof16+sc + conf0.5 + smooth2",
         R5 / "samples_b16sc_conf05_smooth2/summary.json"),
        ("il_boot16@10k, bestof16+sc + smooth2",
         R5 / "samples_b16sc_smooth2/summary.json"),
        ("il, bestof16+sc + smooth2 (control)",
         R5 / "samples_ilsc_smooth2/summary.json"),
        ("il_boot16@10k, bestof16+sc + conf0.5 + smooth4",
         R5 / "samples_b16sc_conf05_smooth4/summary.json"),
        ("il_boot16@10k, bestof16+sc + conf0.5 + smooth6",
         R5 / "samples_b16sc_conf05_smooth6/summary.json"),
        ("il_smw (+1.5k curvature loss), bestof16+sc + conf0.5",
         R5 / "samples_smw_conf05/summary.json"),
        ("il_smw, bestof16+sc + conf0.5 + smooth2",
         R5 / "samples_smw_conf05_smooth2/summary.json"),
    ]
    for name, p in grid:
        print(row(name, load(p)))
    print("\noracle-anchor rows (same cells):\n")
    print("| cell | Collision | MSE-to-GT | Smoothness |")
    print("|---|---|---|---|")
    for name, p in grid:
        print(row(name, load(p), oracle=True))

    print("\n## Stage-1 idx-policy-mix ablation (8k steps/arm)\n")
    print("| mix | Collision (interp / refined) | MSE-to-GT | Smoothness |")
    print("|---|---|---|---|")
    for d in sorted(B4.glob("ablate_kp_*/samples/summary.json")):
        print(row(d.parent.parent.name.replace("ablate_kp_", ""), load(d)))

    print("\n## idx-policy-mix at the headline budget (20k steps/arm)\n")
    print("| mix | Collision (interp / refined) | MSE-to-GT | Smoothness |")
    print("|---|---|---|---|")
    for d in sorted(B4.glob("ablate20k_kp_*/samples/summary.json")):
        print(row(d.parent.parent.name.replace("ablate20k_kp_", ""), load(d)))

    print("\n## wansynth_tiny Stage-2 trained-scale eval\n")
    wt = load("runs/wansynth_tiny/eval_stage2/summary.json")
    print(json.dumps(wt, indent=2) if wt else "—")

    print("\n## maze_q10k refresh\n")
    mz = load("runs/maze_q10k/samples_uniform/summary.json")
    print(json.dumps(mz, indent=2) if mz else "—")

    print("\n## serving sweep\n")
    sv = load("docs/serving_sweep_r5.json")
    if sv:
        print(json.dumps({k: sv[k] for k in sv if k != "sweep"}, indent=2))
        best = max((r for r in sv.get("sweep", [])),
                   key=lambda r: r.get("samples_per_sec", 0), default=None)
        if best:
            print("best operating point:", json.dumps(best))
    else:
        print("—")

    print("\n## small-L on-chip profile\n")
    pr = load("docs/profile_smallL.json")
    print(json.dumps(pr, indent=2) if pr else "—")

    print("\n## step markers\n")
    for m in sorted(LOG.glob("*.done")) + sorted(LOG.glob("*.cut")) + \
            sorted(LOG.glob("*.failed")):
        name = m.name.rsplit(".", 1)[0]
        print(f"- {name}: {marker_state(name)}")


if __name__ == "__main__":
    main()
