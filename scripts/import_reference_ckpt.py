"""Convert a reference PyTorch checkpoint (.pt) into this framework's native
checkpoint-directory format.

After conversion, trainers/samplers load it with no torch dependency:

    python scripts/import_reference_ckpt.py \
        --src ref_runs/kp/ckpt_0100000.pt --kind keypoint --out runs/kp_imported

    python -m interpolated_diffusion_tpu.sample.generate \
        --kp_ckpt runs/kp_imported ...

Kinds: keypoint | interp | interp_causal | selector | segment_cost.
The reference meta dict is normalized to this framework's key names
(models/torch_import.py); `--maze_h/--maze_w` supply the conditioning grid
size, which reference checkpoints do not record.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interpolated_diffusion_tpu.models.torch_import import (  # noqa: E402
    load_reference_denoiser,
    load_reference_segment_cost,
    load_reference_selector,
)
from interpolated_diffusion_tpu.utils.checkpoint import save_checkpoint  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser("import_reference_ckpt")
    p.add_argument("--src", type=str, required=True, help="reference .pt file")
    p.add_argument("--kind", type=str, required=True,
                   choices=["keypoint", "interp", "interp_causal", "selector",
                            "segment_cost"])
    p.add_argument("--out", type=str, required=True, help="output checkpoint dir")
    p.add_argument("--use_ema", type=int, default=1)
    p.add_argument("--maze_h", type=int, default=21)
    p.add_argument("--maze_w", type=int, default=21)
    args = p.parse_args(argv)

    if args.kind in ("keypoint", "interp", "interp_causal"):
        model, params, meta = load_reference_denoiser(
            args.src, args.kind, bf16=False, use_ema=bool(args.use_ema))
    elif args.kind == "selector":
        model, params, meta = load_reference_selector(
            args.src, bf16=False, use_ema=bool(args.use_ema))
    else:
        model, params, meta = load_reference_segment_cost(
            args.src, bf16=False, use_ema=bool(args.use_ema))

    stage = {"keypoint": "keypoints", "interp": "interp_levels",
             "interp_causal": "interp_levels", "selector": "selector",
             "segment_cost": "segment_cost"}[args.kind]
    meta = dict(meta)
    meta.setdefault("stage", stage)
    meta.setdefault("maze_h", args.maze_h)
    meta.setdefault("maze_w", args.maze_w)
    if args.kind == "interp_causal":
        meta.setdefault("causal", 1)
    meta["imported_from"] = os.path.abspath(args.src)

    step = int(meta.get("step", 0))
    save_checkpoint(args.out, params, step=step, meta=meta)
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"imported {args.kind} ({n/1e6:.2f}M params) -> {args.out}")


if __name__ == "__main__":
    main()
