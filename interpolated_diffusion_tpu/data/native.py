"""ctypes bindings for the native (C++) data-path library.

The shard-generation hot loop (maze gen + A* + resampling) lives in
native/maze_gen.cpp, built to libmaze_native.so by native/build.sh. Falls
back to the pure-Python generators when the library isn't built (identical
contract; different — but equally deterministic — RNG stream, both seeded
per sample index).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "libmaze_native.so")
_lib: Optional[ctypes.CDLL] = None


def _build_if_needed() -> bool:
    if os.path.exists(_LIB_PATH):
        return True
    src = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "maze_gen.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not _build_if_needed():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.generate_maze_batch.restype = ctypes.c_int
    lib.generate_maze_batch.argtypes = [
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_native() is not None


def generate_maze_batch_native(
    seed: int, n: int, h: int, w: int, p_wall_min: float, p_wall_max: float,
    T: int, with_velocity: bool,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (x [n,T,D], occ [n,1,h,w], start_goal [n,4])."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native maze library unavailable")
    D = 4 if with_velocity else 2
    x = np.zeros((n, T, D), dtype=np.float32)
    occ = np.zeros((n, h, w), dtype=np.float32)
    sg = np.zeros((n, 4), dtype=np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    made = lib.generate_maze_batch(
        ctypes.c_uint64(seed), n, h, w,
        ctypes.c_float(p_wall_min), ctypes.c_float(p_wall_max),
        T, int(with_velocity),
        x.ctypes.data_as(fp), occ.ctypes.data_as(fp), sg.ctypes.data_as(fp),
    )
    if made != n:
        raise RuntimeError(f"native generator produced {made}/{n} samples")
    return x, occ[:, None], sg
