"""Training watchdog: supervise runs, restart dead ones with --resume.

Capability parity with reference scripts/watchdog_train.py (:20-39): a
supervisor that keeps a training command alive — when the process dies it
finds the latest ckpt_<step> directory under the run's out_dir, injects or
updates `--resume <ckpt>` in the command, and restarts, up to --max_restarts.
Uses plain subprocess supervision (no tmux dependency); logs restart events.

Usage:
  python scripts/watchdog_train.py --out_dir runs/kp --max_restarts 100 -- \
      python -m interpolated_diffusion_tpu.train.train_keypoints --out_dir runs/kp ...
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def find_latest_ckpt(out_dir: str):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from interpolated_diffusion_tpu.utils.checkpoint import latest_checkpoint

    return latest_checkpoint(out_dir)


def inject_resume(cmd, ckpt):
    cmd = list(cmd)
    if "--resume" in cmd:
        i = cmd.index("--resume")
        cmd[i + 1] = ckpt
    else:
        cmd += ["--resume", ckpt]
    return cmd


def main():
    p = argparse.ArgumentParser("watchdog_train")
    p.add_argument("--out_dir", type=str, required=True,
                   help="run dir to scan for ckpt_<step> checkpoints")
    p.add_argument("--max_restarts", type=int, default=100)
    p.add_argument("--min_uptime", type=float, default=30.0,
                   help="runs dying faster than this count as crash loops")
    p.add_argument("--backoff", type=float, default=10.0)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="training command after --")
    args = p.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("missing training command (after --)")

    restarts = 0
    crash_loops = 0
    while True:
        run_cmd = list(cmd)
        ckpt = find_latest_ckpt(args.out_dir)
        if ckpt:
            run_cmd = inject_resume(run_cmd, ckpt)
        print(f"[watchdog] launching (restart {restarts}): {' '.join(run_cmd)}",
              flush=True)
        t0 = time.time()
        proc = subprocess.run(run_cmd)
        uptime = time.time() - t0
        if proc.returncode == 0:
            print(f"[watchdog] run completed cleanly after {uptime:.0f}s", flush=True)
            return 0
        restarts += 1
        crash_loops = crash_loops + 1 if uptime < args.min_uptime else 0
        print(f"[watchdog] run died (rc={proc.returncode}, uptime {uptime:.0f}s); "
              f"restart {restarts}/{args.max_restarts}", flush=True)
        if restarts >= args.max_restarts or crash_loops >= 5:
            print("[watchdog] giving up (restart budget or crash loop)", flush=True)
            return 1
        time.sleep(args.backoff * (2 ** min(crash_loops, 4)))


if __name__ == "__main__":
    sys.exit(main())
