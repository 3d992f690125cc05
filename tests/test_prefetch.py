"""Background-thread device prefetcher (utils/prefetch.py)."""
import time

import pytest

from interpolated_diffusion_tpu.utils.prefetch import DevicePrefetcher


def test_order_preserved():
    pf = DevicePrefetcher(iter(range(5)), lambda x: x * 10, depth=2)
    assert list(pf) == [0, 10, 20, 30, 40]


def test_exceptions_propagate():
    def bad():
        yield 1
        raise RuntimeError("decode failed")

    pf = DevicePrefetcher(bad(), lambda x: x, depth=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        next(pf)


def test_producer_overlaps_consumer():
    t0 = time.time()

    def slow_put(x):
        time.sleep(0.1)
        return x

    out = []
    for x in DevicePrefetcher(iter(range(4)), slow_put, depth=2):
        time.sleep(0.1)
        out.append(x)
    assert out == [0, 1, 2, 3]
    # serial execution is >= 0.8 s of sleeps; any real overlap lands well
    # under that even on a loaded machine
    assert time.time() - t0 < 0.78
