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


def test_window_episodes_velocity_scaling():
    """Velocity channels come from the observation velocities scaled by the
    position bounds (reference dataset.py:537-545) — O(1) like positions,
    NOT finite-diff divided by dt (which blows up ~T x and destabilized the
    round-2 D4RL Stage-1)."""
    import numpy as np

    from interpolated_diffusion_tpu.data.d4rl import window_episodes

    occ = np.zeros((9, 9), np.float32)
    n, T = 300, 16
    t = np.linspace(0, 4 * np.pi, n)
    pos = np.stack([4 + 3 * np.cos(t), 4 + 3 * np.sin(t)], axis=1)
    vel = np.stack([-3 * np.sin(t), 3 * np.cos(t)], axis=1)  # env units
    obs = np.concatenate([pos, vel], axis=1).astype(np.float32)
    data = window_episodes(obs, np.zeros(n, bool), occ, T, 4,
                           window_mode="random", with_velocity=True)
    x = data["x"]
    assert x.shape[-1] == 4
    # env vel (max 3) / pos_scale (8) = 0.375 — same order as positions
    assert np.abs(x[..., 2:]).max() <= 0.5
    np.testing.assert_allclose(np.abs(x[..., 2:]).max(), 3.0 / 8.0, atol=0.05)

    # fallback without velocity columns: per-step deltas, no 1/dt blowup
    data2 = window_episodes(obs[:, :2], np.zeros(n, bool), occ, T, 4,
                            window_mode="random", with_velocity=True)
    assert np.abs(data2["x"][..., 2:]).max() < 0.2
