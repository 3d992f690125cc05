"""Precompute teacher mid-frame latents into key-joined tar shards.

Capability parity with reference scripts/datasets/wan_synth/
precompute_ldmvfi_teacher.py: a frozen teacher interpolates mid-frames
between anchor latents, written as `{key}.teacher_latents` shards that
`create_wan_synth_teacher_dataloader` joins back to the data stream
(data/wan_synth.py) for flow-interpolator distillation.

Teachers: `lerp` (built-in, runs everywhere — the distillation-pipeline
smoke baseline), `model:<ckpt>` (a trained in-repo flow/sinkhorn
interpolator checkpoint as the teacher — the LDMVFI slot filled without
the external repo), or `ldmvfi` (external repo, unavailable in this env;
the reference's own LDMVFI distillation was a negative result,
PROJECT_LOG.md:845-857). For synthetic data (--data synthetic) the shards
are generated from the same procedural latents the trainers use.
"""
from __future__ import annotations

import argparse
import os

from ..teachers.teacher import LerpTeacher, ModelTeacher, precompute_teacher_shards


def _make_teacher(name: str):
    if name == "lerp":
        return LerpTeacher()
    if name.startswith("model:"):
        return ModelTeacher(name.split(":", 1)[1])
    if name == "ldmvfi":
        raise SystemExit(
            "ldmvfi teacher needs the external LDMVFI repo + GPU stack "
            "(reference src/teachers/ldmvfi_teacher.py); unavailable here — "
            "use --teacher lerp, --teacher model:<interpolator ckpt>, or "
            "precompute on a machine that has it"
        )
    raise ValueError(f"unknown teacher {name}")


def main(argv=None):
    p = argparse.ArgumentParser("precompute_teacher")
    p.add_argument("--data_root", type=str, required=True,
                   help="wan-synth tar shard directory")
    p.add_argument("--out_root", type=str, required=True)
    p.add_argument("--T", type=int, default=21)
    p.add_argument("--teacher", type=str, default="lerp",
                   help="lerp | model:<interpolator ckpt> | ldmvfi")
    p.add_argument("--shard_size", type=int, default=64)
    args = p.parse_args(argv)
    os.makedirs(args.out_root, exist_ok=True)
    n = precompute_teacher_shards(
        args.data_root, args.out_root, args.T,
        teacher=_make_teacher(args.teacher), shard_size=args.shard_size,
    )
    print(f"wrote teacher shards for {n} clips under {args.out_root}")


if __name__ == "__main__":
    main()
