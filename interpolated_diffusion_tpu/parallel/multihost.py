"""Multi-host (pod-scale) runtime helpers.

Single-slice multi-chip runs are pure SPMD over `make_mesh` (parallel/mesh.py)
— on one host, `jax.devices()` already sees every chip. On a TPU pod each
host only *feeds* its local chips: jax.distributed wires the processes into
one logical runtime, global arrays span hosts, and XLA's collectives ride
ICI across the slice. This module holds the (small) amount of host-aware
code the framework needs for that jump:

  * `maybe_initialize_distributed()` — idempotent jax.distributed bring-up
    driven by env/args (TPU pods auto-discover; CPU/GPU fleets pass
    coordinator/num_processes/process_id explicitly).
  * `global_batch_from_local(...)` — assemble a host-sharded global batch
    from each process's local slice (`jax.make_array_from_process_local_data`)
    so data loaders stay per-host (each host reads only its shard of the
    dataset — data/wan_synth.py's split_by_process does this keyed on
    `jax.process_index()`).
  * `assert_same_across_processes(...)` — cheap collective-backed guard that
    config/seed agree across hosts before a long run diverges silently.

Nothing here is needed (or does anything) in single-process runs — every
helper degrades to a no-op / plain device_put, and the CPU test mesh
exercises the same code paths with process_count == 1.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed once, if a multi-process run is requested.

    Returns True when running multi-process (after initialization), False for
    plain single-process runs. Explicit args win; otherwise the standard env
    vars are consulted (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or a TPU-pod environment where jax.distributed
    auto-discovers everything). Must run before the backend initializes to
    take effect — call it first thing in a trainer's main().
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None)
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None)
    # pod auto-discovery must be explicit: single-chip tunnel setups also
    # plant pod-looking env (TPU_WORKER_HOSTNAMES=localhost), so sniffing it
    # would break every local run
    on_pod = os.environ.get("ID_TPU_MULTIHOST") == "1"

    if not (coordinator_address or on_pod):
        return False      # single-process: nothing to do

    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        raise RuntimeError(
            "maybe_initialize_distributed() ran after the XLA backend was "
            "already initialized — call it before any jax.devices()/"
            "device_put/computation (first thing in main()).")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    return jax.process_count() > 1


def global_batch_from_local(local_batch: Any, mesh: Mesh,
                            batch_axis: str = "data") -> Any:
    """Host-local arrays → one global batch sharded over `batch_axis`.

    Each process passes its own slice (global_batch_size / process_count
    rows); the result is a global jax.Array whose addressable shards are the
    local rows — no cross-host copy of the data itself. Single-process this
    is exactly shard_batch.
    """
    def put(x):
        nd = getattr(x, "ndim", 0)
        spec = P(batch_axis) if nd >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, local_batch)


def assert_same_across_processes(value: float, what: str = "config") -> None:
    """Fail fast if a scalar (seed, config hash, …) differs across hosts.

    A cross-process allgather doubles as a liveness check of the distributed
    runtime before a long run. Trivially true single-process.
    """
    local = np.asarray([float(value)], np.float64)
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    gathered = np.asarray(multihost_utils.process_allgather(local))
    if not np.all(gathered == local[0]):
        raise ValueError(
            f"{what} differs across processes: "
            f"local={local[0]} gathered={gathered.ravel().tolist()}")


def process_local_slice(n: int) -> slice:
    """Row range of a length-n global batch owned by this process."""
    per = n // max(1, jax.process_count())
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
