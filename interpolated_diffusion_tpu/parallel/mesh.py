"""Device mesh + sharding rules — the framework's distribution layer.

This is a NEW first-class capability relative to the reference (which is
single-GPU only, SURVEY.md §2.4/§5.8): data parallelism for all trainers and
tensor parallelism for large DiT backbones, expressed as
`jax.sharding.Mesh` + NamedSharding and compiled by XLA's SPMD partitioner
(collectives ride ICI within a slice; no hand-written comm code).

Axes:
  data   — batch dimension (DP); gradients all-reduce automatically.
  model  — attention heads / FFN hidden (TP) for Wan-scale models.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis. ICI-adjacent devices land on
    the model axis (fastest-varying), which keeps TP collectives on the
    highest-bandwidth links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} does not match {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def make_mesh_for_batch(
    batch_size: int,
    n_data: Optional[int] = None,
    n_model: int = 1,
) -> Mesh:
    """Mesh whose data axis divides the batch (small debug batches shrink DP
    width instead of erroring)."""
    import math

    devices = jax.devices()
    if n_data is None:
        n_data = max(1, len(devices) // n_model)
        n_data = math.gcd(n_data, batch_size) or 1
    return make_mesh(n_data=n_data, n_model=n_model,
                     devices=devices[: n_data * n_model])


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding: leading axis split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every leaf's leading (batch) axis over the data axis."""
    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def shard_superbatch(batch: Any, mesh: Mesh) -> Any:
    """Shard [S, B, ...] superbatches: steps replicated, batch axis on data."""
    def put(x):
        nd = getattr(x, "ndim", 0)
        spec = P(None, "data") if nd >= 2 else (P(None) if nd == 1 else P())
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)
