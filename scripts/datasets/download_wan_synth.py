"""Download wan-synth latent/text shards from the HF dataset mirror.

Capability parity with reference scripts/datasets/wan_synth/
download_wan_synth.py: snapshot_download of the shard tars the Wan trainers
stream (`--data tar --data_root ...`). Zero egress in this build env —
`--plan 1` prints the plan instead (used by tests).
"""
from __future__ import annotations

import argparse

DEFAULT_REPO = "worstcoder/Wan_datasets"
DEFAULT_PATTERN = ("Wan2.1_14B_480p_16:9_Euler-step100_shift-3.0_cfg-5.0_"
                   "seed-0_250K/shard-*.tar")


def main(argv=None):
    p = argparse.ArgumentParser("download_wan_synth")
    p.add_argument("--repo_id", type=str, default=DEFAULT_REPO)
    p.add_argument("--pattern", type=str, default=DEFAULT_PATTERN)
    p.add_argument("--out_dir", type=str, default="data/wan_synth")
    p.add_argument("--plan", type=int, default=0)
    args = p.parse_args(argv)
    if args.plan:
        print(f"huggingface snapshot_download(repo_id={args.repo_id}, "
              f"repo_type=dataset, allow_patterns=[{args.pattern}]) "
              f"-> {args.out_dir}")
        return
    from huggingface_hub import snapshot_download

    path = snapshot_download(repo_id=args.repo_id, repo_type="dataset",
                             local_dir=args.out_dir,
                             allow_patterns=[args.pattern])
    print(f"shards at {path}")


if __name__ == "__main__":
    main()
