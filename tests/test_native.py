"""Native (C++) data-path tests: builds the library, checks trajectory
validity invariants and the Python-path contract, measures the speedup."""
import time

import numpy as np
import pytest

from interpolated_diffusion_tpu.data.native import (
    generate_maze_batch_native,
    native_available,
)


@pytest.fixture(scope="module")
def native():
    if not native_available():
        pytest.skip("g++ unavailable; native path not built")
    return True


def test_native_generation_invariants(native):
    n, h, w, T = 32, 21, 21, 64
    x, occ, sg = generate_maze_batch_native(7, n, h, w, 0.15, 0.3, T, False)
    assert x.shape == (n, T, 2) and occ.shape == (n, 1, h, w) and sg.shape == (n, 4)
    assert np.all((x >= 0) & (x <= 1))
    # endpoints hit start/goal cell centers
    np.testing.assert_allclose(x[:, 0], sg[:, :2], atol=1e-5)
    np.testing.assert_allclose(x[:, -1], sg[:, 2:], atol=1e-5)
    # trajectory cells are collision-free (cell-center sampling like metrics)
    for b in range(n):
        j = np.clip(np.round(x[b, :, 0] * (w - 1)).astype(int), 0, w - 1)
        i = np.clip(np.round(x[b, :, 1] * (h - 1)).astype(int), 0, h - 1)
        coll = occ[b, 0, i, j] > 0.5
        assert coll.mean() < 0.15, f"sample {b}: collision {coll.mean():.2f}"
    # boundary walls present
    assert np.all(occ[:, 0, 0, 1:-1].mean(-1) > 0.8)


def test_native_velocity_channels(native):
    x, _, _ = generate_maze_batch_native(3, 4, 15, 15, 0.2, 0.2, 32, True)
    assert x.shape == (4, 32, 4)
    dt = 1.0 / 32
    want_v = (x[:, 1:, :2] - x[:, :-1, :2]) / dt
    np.testing.assert_allclose(x[:, :-1, 2:], want_v, atol=1e-4)
    np.testing.assert_allclose(x[:, -1, 2:], 0.0)


def test_native_determinism(native):
    a = generate_maze_batch_native(42, 8, 15, 15, 0.2, 0.3, 32, False)
    b = generate_maze_batch_native(42, 8, 15, 15, 0.2, 0.3, 32, False)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = generate_maze_batch_native(43, 8, 15, 15, 0.2, 0.3, 32, False)
    assert not np.array_equal(a[0], c[0])


def test_dataset_uses_native_and_is_faster(native):
    from interpolated_diffusion_tpu.data.dataset import ParticleMazeDataset

    n = 256
    ds_nat = ParticleMazeDataset(num_samples=n, T=64, shard_size=n,
                                 seed=1, use_native="always")
    t0 = time.time()
    batch = ds_nat.get_batch(np.arange(n))
    t_nat = time.time() - t0
    assert batch["x"].shape == (n, 64, 2)

    ds_py = ParticleMazeDataset(num_samples=64, T=64, shard_size=64,
                                seed=1, use_native="never")
    t0 = time.time()
    ds_py.get_batch(np.arange(64))
    t_py = (time.time() - t0) * (n / 64)
    speedup = t_py / max(t_nat, 1e-9)
    print(f"native shard build speedup: {speedup:.1f}x "
          f"({t_nat:.2f}s vs ~{t_py:.2f}s scaled)")
    assert speedup > 3, f"native path too slow ({speedup:.1f}x)"
