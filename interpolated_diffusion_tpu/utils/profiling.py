"""Profiling harness: jax.profiler traces + block_until_ready timing.

TPU equivalent of the reference's hand-rolled CUDA-event telemetry
(SURVEY.md §5.1): `trace()` captures an XLA/TPU profile viewable in
TensorBoard or Perfetto; `time_fn` gives steady-state wall-clock with
compile excluded.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> Tuple[float, object]:
    """Median-free steady-state timing: (seconds/iter, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out
