"""D4RL prepared-data route tests (gym-free)."""
import numpy as np
import pytest

from interpolated_diffusion_tpu.data.d4rl import (
    MAZE_SPECS,
    maze_map_to_occ,
    parse_maze_spec,
    split_episodes,
    window_episodes,
)


def test_maze_spec_parsing():
    arr = parse_maze_spec(MAZE_SPECS["maze2d-umaze-v1"])
    assert arr.shape == (5, 5)
    occ = maze_map_to_occ(arr)
    assert occ.shape == (5, 5)
    assert occ[0].all() and occ[-1].all()          # boundary walls
    assert occ[1, 1] == 0                           # G cell is free
    # 0/1 arrays pass through
    occ2 = maze_map_to_occ(np.eye(4, dtype=np.int32))
    np.testing.assert_array_equal(occ2, np.eye(4))


def test_split_episodes_and_windowing():
    terminals = np.zeros(300, dtype=bool)
    terminals[99] = terminals[199] = terminals[299] = True
    eps = split_episodes(terminals)
    assert eps == [(0, 100), (100, 200), (200, 300)]

    occ = maze_map_to_occ(MAZE_SPECS["maze2d-umaze-v1"])
    # random walk inside the free band of the umaze (world coords ~[0.5, 3.5])
    rng = np.random.RandomState(0)
    obs = np.zeros((300, 4), dtype=np.float32)
    obs[:, 0] = 1.0 + 2.0 * rng.rand(300)
    obs[:, 1] = 1.0 + 0.2 * rng.rand(300)  # stay in one free corridor row
    data = window_episodes(obs, terminals, occ, T=32, num_samples=16,
                           window_mode="random", max_collision_rate=0.5)
    assert data["x"].shape[1:] == (32, 2)
    assert data["occ"].shape[1:] == (1, 5, 5)
    assert np.all((data["x"] >= 0) & (data["x"] <= 1))
    np.testing.assert_allclose(data["start_goal"][:, :2], data["x"][:, 0])


def test_rejection_sampling_filters():
    occ = np.zeros((5, 5), dtype=np.float32)
    terminals = np.zeros(200, dtype=bool)
    terminals[-1] = True
    # nearly static trajectory -> rejected by min_path_len
    obs = np.full((200, 2), 2.0, dtype=np.float32)
    with pytest.raises(ValueError):
        window_episodes(obs, terminals, occ, T=16, num_samples=4,
                        min_path_len=1.0, max_resample_tries=5)


def test_window_episodes_velocity_convention():
    """vel_mode='fd' (default) must match recompute_velocity_channels
    bitwise — the round-2 D4RL divergence came from the prep storing obs
    velocities (O(0.2)) while Stage-2 corruption recomputed fd×T velocities
    (~13× larger on the synthetic episodes)."""
    import numpy as np

    from interpolated_diffusion_tpu.data.d4rl import window_episodes
    from interpolated_diffusion_tpu.ops.keyframes import (
        recompute_velocity_channels,
    )

    occ = np.zeros((9, 9), np.float32)
    n, T = 300, 16
    t = np.linspace(0, 4 * np.pi, n)
    pos = np.stack([4 + 3 * np.cos(t), 4 + 3 * np.sin(t)], axis=1)
    vel = np.stack([-3 * np.sin(t), 3 * np.cos(t)], axis=1)  # env units
    obs = np.concatenate([pos, vel], axis=1).astype(np.float32)

    # fd (default): v[t] = (pos[t+1] − pos[t])·T, v[-1] = 0 — identical to
    # the corruption-side recompute, so the conventions cannot drift again
    data = window_episodes(obs, np.zeros(n, bool), occ, T, 4,
                           window_mode="random", with_velocity=True)
    x = data["x"]
    assert x.shape[-1] == 4
    rec = np.asarray(recompute_velocity_channels(x, T))
    np.testing.assert_allclose(x[..., 2:], rec[..., 2:], atol=1e-5)
    # circular path: |diff|·T = 3·(4π/300)/8·16 ≈ 0.25 — O(1) like positions
    assert 0.1 < np.abs(x[..., 2:]).max() < 0.5

    # obs mode: reference normalization (dataset.py:537-545) — env vel
    # (max 3) / pos_scale (8) = 0.375
    data2 = window_episodes(obs, np.zeros(n, bool), occ, T, 4,
                            window_mode="random", with_velocity=True,
                            vel_mode="obs")
    np.testing.assert_allclose(
        np.abs(data2["x"][..., 2:]).max(), 3.0 / 8.0, atol=0.05)

    # without velocity columns, obs mode falls back to fd
    data3 = window_episodes(obs[:, :2], np.zeros(n, bool), occ, T, 4,
                            window_mode="random", with_velocity=True,
                            vel_mode="obs")
    rec3 = np.asarray(recompute_velocity_channels(data3["x"], T))
    np.testing.assert_allclose(data3["x"][..., 2:], rec3[..., 2:], atol=1e-5)
