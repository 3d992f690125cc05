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


class ModelTeacher:
    """A trained in-repo interpolator checkpoint as the distillation teacher.

    Fills the reference's external-LDMVFI slot (src/teachers/
    ldmvfi_teacher.py:48-127) without the external GPU repo: a
    flow_interpolator or sinkhorn_interp checkpoint (meta["stage"] selects
    the architecture) produces the mid-frame targets — self-distillation
    into smaller students, or cross-distillation between interpolator
    families. Same `interpolate(z0, z1, alpha)` surface as LerpTeacher, so
    precompute_teacher_shards takes it unchanged."""

    def __init__(self, ckpt: str, alpha_steps: int = 2):
        import jax
        import jax.numpy as jnp

        from ..models.loading import resolve_ckpt
        from ..utils.checkpoint import load_checkpoint, read_meta

        path = resolve_ckpt(ckpt)
        _, meta = read_meta(path)
        stage = meta.get("stage")
        C = int(meta["in_channels"])
        self.in_channels = C
        self._alpha_steps = int(alpha_steps)
        key = jax.random.PRNGKey(0)
        if stage == "flow_interpolator":
            from ..models.flow_interpolator import LatentFlowInterpolator

            model = LatentFlowInterpolator(
                in_channels=C, base_channels=int(meta["base_channels"]),
                max_flow=float(meta["max_flow"]),
                residual_blocks=int(meta["residual_blocks"]),
                time_mask=bool(meta["time_mask"]), gap_cond=bool(meta["gap_cond"]),
                use_cost_volume=bool(meta["cost_volume"]),
                cv_radius=int(meta["cv_radius"]),
            )
            lat0 = jnp.zeros((1, 3, C, 8, 8))
            idx0 = jnp.asarray([[0, 2]], jnp.int32)
            tmpl = model.init(key, lat0, idx0)["params"]
            _, payload = load_checkpoint(path, tmpl)
            params = payload["params"]
            gap_cond = bool(meta["gap_cond"])

            @jax.jit
            def pair_fn(z0, z1, alpha, gap):
                z, _ = model.apply(
                    {"params": params}, z0, z1, alpha,
                    gap=gap if gap_cond else None,
                    method=LatentFlowInterpolator.interpolate_pair,
                )
                return z

            self._pair_fn = pair_fn
        elif stage == "sinkhorn_interp":
            from ..models.sinkhorn_warp import SinkhornWarpInterpolator

            model = SinkhornWarpInterpolator.from_meta(meta, in_channels=C)
            n = self._alpha_steps
            lat0 = jnp.zeros((1, n + 1, C, 8, 8))
            idx0 = jnp.asarray([[0, n]], jnp.int32)
            tmpl = model.init(key, lat0, idx0)["params"]
            _, payload = load_checkpoint(path, tmpl)
            params = payload["params"]

            # pairwise via the segment interpolator on a (n+1)-frame grid:
            # anchors at 0 and n, the frame at round(alpha·n) is the output
            @jax.jit
            def pair_fn(z0, z1, alpha, gap):
                del gap
                B = z0.shape[0]
                lat = jnp.zeros((B, n + 1, *z0.shape[1:]), z0.dtype)
                lat = lat.at[:, 0].set(z0).at[:, n].set(z1)
                idx = jnp.broadcast_to(jnp.asarray([0, n], jnp.int32), (B, 2))
                out, _ = model.apply({"params": params}, lat, idx)
                k = jnp.clip(jnp.round(alpha[0] * n).astype(jnp.int32), 0, n)
                return jax.lax.dynamic_index_in_dim(out, k, axis=1,
                                                    keepdims=False)

            self._pair_fn = pair_fn
        else:
            raise ValueError(
                f"checkpoint stage {stage!r} is not an interpolator "
                "(expected flow_interpolator or sinkhorn_interp)")

    def interpolate(self, z0: np.ndarray, z1: np.ndarray,
                    alpha: float = 0.5, gap: float = 2.0) -> np.ndarray:
        """[C,H,W] or [B,C,H,W] endpoint latents → mid-frame at alpha."""
        import jax.numpy as jnp

        z0a, z1a = np.asarray(z0, np.float32), np.asarray(z1, np.float32)
        squeeze = z0a.ndim == 3
        if squeeze:
            z0a, z1a = z0a[None], z1a[None]
        B = z0a.shape[0]
        out = self._pair_fn(
            jnp.asarray(z0a), jnp.asarray(z1a),
            jnp.full((B,), alpha, jnp.float32), jnp.full((B,), gap, jnp.float32),
        )
        out = np.asarray(out)
        return out[0] if squeeze else out


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
