"""Teacher-distillation interface (LDMVFI-style frame interpolation teachers).

Parity with reference src/teachers/ldmvfi_teacher.py (LDMVFITEACHER :48,
interpolate :86): a frozen external model produces mid-frame targets that the
flow/interp students distill from. The reference sys.path-injects an external
GPU repo; on TPU the teacher runs at PREP time only — its outputs are written
into teacher tar shards (data/wan_synth.py key-join `teacher_latents`) that
the flow-interpolator trainer consumes via --data tar.

`PrecomputedTeacher` replays those shards; `LerpTeacher` is the built-in
trivial teacher (useful as the distillation-pipeline smoke baseline; note the
reference's LDMVFI distillation was itself a negative result —
PROJECT_LOG.md:845-857 — so the pipeline, not the teacher, is the asset).
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


class LerpTeacher:
    """Trivial teacher: mid-frame = lerp of the endpoint latents."""

    def interpolate(self, z0: np.ndarray, z1: np.ndarray, alpha: float = 0.5) -> np.ndarray:
        return (1.0 - alpha) * z0 + alpha * z1


class PrecomputedTeacher:
    """Streams teacher mid-frame latents from tar shards keyed to the data."""

    def __init__(self, teacher_root: str):
        self.teacher_root = teacher_root

    def stream(self, data_root: str, T: int) -> Iterator[Dict[str, np.ndarray]]:
        from ..data.wan_synth import WanSynthTarDataset

        ds = WanSynthTarDataset(data_root, T=T, shuffle_shards=False,
                                shuffle_buffer=1, teacher_root=self.teacher_root,
                                process_split=False)
        yield from ds


def precompute_teacher_shards(
    data_root: str, out_root: str, T: int,
    teacher: Optional[object] = None, shard_size: int = 64,
) -> int:
    """Write `{key}.teacher_latents.npy` shards for every clip (mid-frames
    between consecutive uniform anchors from the given teacher).

    Output shards mirror the source shard basenames — the trainer-side
    key-join (wan_synth.py: `teacher_root/<same basename>`) depends on it,
    including under shuffled shard order. `shard_size` is therefore implied
    by the source sharding and kept only for signature compatibility."""
    import os

    from ..data.wan_synth import (
        _maybe_transpose_latents,
        iter_tar_samples,
        list_shards,
        write_tar_shard,
    )

    teacher = teacher or LerpTeacher()
    n = 0
    for sh in list_shards(data_root):
        out = []
        for sample in iter_tar_samples(sh):
            # raw shards may be [C,T,H,W]; normalize to time-first like the
            # trainer-side loader does before interpolating over frames
            lat = _maybe_transpose_latents(np.asarray(sample["latents"]), T)
            mids = np.stack([
                teacher.interpolate(lat[t], lat[min(t + 2, lat.shape[0] - 1)])
                for t in range(0, lat.shape[0] - 1, 2)
            ])
            out.append({"__key__": sample["__key__"],
                        "teacher_latents": mids.astype(np.float32)})
            n += 1
        if out:
            write_tar_shard(os.path.join(out_root, os.path.basename(sh)), out)
    return n
