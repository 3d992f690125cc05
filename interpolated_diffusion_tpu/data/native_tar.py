"""ctypes bindings for the native tar-shard reader (native/tar_reader.cpp).

Python's tarfile walks headers and copies member payloads under the GIL,
which serializes the device prefetcher's worker threads (utils/prefetch.py).
The native reader indexes a shard's ustar headers once and serves members
with pread(); ctypes foreign calls release the GIL, so prefetch workers
stream shards truly concurrently. The npy decode stays in numpy (header
parse + view — cheap next to the IO).

`iter_tar_samples_native(path)` yields exactly what
data/wan_synth.iter_tar_samples yields (same grouping, same arrays);
wan_synth routes through it automatically when the library builds, and
falls back to tarfile otherwise (set IDT_NATIVE_TAR=0 to force the
fallback).
"""
from __future__ import annotations

import ctypes
import io
import os
import subprocess
from typing import Dict, Iterator, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "libtar_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_if_needed() -> bool:
    if os.path.exists(_LIB_PATH):
        return True
    src = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "tar_reader.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load_native() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if os.environ.get("IDT_NATIVE_TAR", "1") == "0":
        return None
    if not _build_if_needed():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tar_open.restype = ctypes.c_void_p
    lib.tar_open.argtypes = [ctypes.c_char_p]
    lib.tar_close.restype = None
    lib.tar_close.argtypes = [ctypes.c_void_p]
    lib.tar_count.restype = ctypes.c_int
    lib.tar_count.argtypes = [ctypes.c_void_p]
    lib.tar_name.restype = ctypes.c_char_p
    lib.tar_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tar_size.restype = ctypes.c_longlong
    lib.tar_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tar_read.restype = ctypes.c_longlong
    lib.tar_read.argtypes = [ctypes.c_void_p, ctypes.c_int,
                             ctypes.c_void_p, ctypes.c_longlong]
    _lib = lib
    return lib


def native_tar_available() -> bool:
    return load_native() is not None


class _MVReader:
    """Minimal file-like over a memoryview: numpy's header parser reads only
    the (small) header bytes, leaving the payload uncopied."""

    def __init__(self, mv: memoryview):
        self._mv = mv
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = bytes(self._mv[self.pos:self.pos + n])
        self.pos += len(b)
        return b


def _decode_npy(buf: bytearray, name: str) -> np.ndarray:
    """Zero-copy npy decode: header via numpy's own parser, data as a
    frombuffer view into the read buffer (the bytearray keeps it alive)."""
    f = _MVReader(memoryview(buf))
    version = np.lib.format.read_magic(f)
    if version == (1, 0):
        shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
    elif version == (2, 0):
        shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
    else:  # exotic version — fall back to the copying path
        return np.load(io.BytesIO(bytes(buf)), allow_pickle=False)
    if fortran or dtype.hasobject:
        return np.load(io.BytesIO(bytes(buf)), allow_pickle=False)
    arr = np.frombuffer(buf, dtype=dtype, offset=f.pos,
                        count=int(np.prod(shape)) if shape else 1)
    return arr.reshape(shape)


def iter_tar_samples_native(path: str) -> Iterator[Dict[str, np.ndarray]]:
    """Native twin of wan_synth.iter_tar_samples: {field: array} per key."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native tar reader unavailable")
    h = lib.tar_open(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        n = lib.tar_count(h)
        current_key: Optional[str] = None
        sample: Dict[str, np.ndarray] = {}
        for i in range(n):
            raw = lib.tar_name(h, i)
            if raw is None:
                continue
            base = os.path.basename(raw.decode())
            parts = base.split(".")
            if len(parts) < 3 or parts[-1] != "npy":
                continue
            key = ".".join(parts[:-2])
            field = parts[-2]
            if current_key is not None and key != current_key:
                if sample:
                    yield {"__key__": current_key, **sample}
                sample = {}
            current_key = key
            size = lib.tar_size(h, i)
            buf = bytearray(size)
            got = lib.tar_read(
                h, i, (ctypes.c_char * size).from_buffer(buf), size)
            if got != size:
                raise IOError(f"short read of {base} in {path}")
            sample[field] = _decode_npy(buf, base)
        if current_key is not None and sample:
            yield {"__key__": current_key, **sample}
    finally:
        lib.tar_close(h)
