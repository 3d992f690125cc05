"""Seeding / determinism discipline.

Parity with reference src/utils/seed.py: one call pins every RNG surface.
On TPU/JAX the heavy lifting is structural — jax.random is counter-based and
deterministic by construction — so this seeds the host (numpy / PYTHONHASHSEED)
and exposes the SEED env-var convention (:27) plus an optional XLA
determinism flag for debugging.
"""
from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np


def set_seed(seed: int, deterministic: bool = False) -> None:
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    if deterministic:
        # bit-reproducible XLA reductions (slower; debugging only)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_gpu_deterministic_ops" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " --xla_tpu_enable_async_all_reduce=false").strip()


def get_seed_from_env(default: int = 0) -> int:
    return int(os.environ.get("SEED", default))
