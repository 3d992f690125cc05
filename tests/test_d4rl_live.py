"""Live-env D4RL export adapter, tested on a fake env (no gym/mujoco).

The adapter (data/d4rl_live.py) is the only gym-touching module; these tests
drive it with duck-typed env/model objects and check the exported npz layout
feeds the gym-free prepare path (data/d4rl.py) unchanged.
"""
import numpy as np

from interpolated_diffusion_tpu.data.d4rl_live import (
    export_episodes,
    extract_maze_map,
)
from interpolated_diffusion_tpu.data.d4rl import window_episodes, maze_map_to_occ

IDENT = (1.0, 0.0, 0.0, 0.0)


class _Model:
    def __init__(self):
        # one wall box, one floor box (thin + huge), one named floor plane
        self.ngeom = 3
        self.geom_type = np.array([6, 6, 6])
        self.geom_size = np.array([[0.5, 0.5, 1.0],
                                   [10.0, 10.0, 0.01],
                                   [0.5, 0.5, 1.0]], np.float32)
        self.geom_pos = np.array([[1.0, 2.0, 0.0],
                                  [0.0, 0.0, 0.0],
                                  [3.0, 3.0, 0.0]], np.float32)
        self.geom_quat = np.array([IDENT, IDENT, IDENT], np.float32)
        self.geom_names = ["wall_0", "floor", "block_1"]


class _Sim:
    model = _Model()


class _FakeEnv:
    str_maze_spec = "###\\#G#\\###"
    maze_size_scaling = 4.0
    sim = _Sim()

    def get_dataset(self):
        n = 50
        obs = np.cumsum(np.full((n, 4), 0.05, np.float32), axis=0)
        terminals = np.zeros(n, bool)
        terminals[24] = True
        return {"observations": obs, "terminals": terminals,
                "timeouts": np.zeros(n, bool)}


def test_extract_maze_map_string_spec():
    m = extract_maze_map(_FakeEnv())
    assert m.shape == (3, 3)
    assert m[1, 1] == 12 and m[0, 0] == 10


def test_extract_maze_map_array_attr():
    class Env:
        maze_arr = np.array([[10, 11], [11, 12]])

    np.testing.assert_array_equal(extract_maze_map(Env()), Env.maze_arr)


def test_extract_maze_map_nested_wrapper():
    class Inner:
        maze_map = [[10, 11], [12, 10]]

    class Env:
        unwrapped = Inner()

    np.testing.assert_array_equal(extract_maze_map(Env()),
                                  np.asarray(Inner.maze_map))


def test_export_episodes_layout_feeds_prepare_path():
    env = _FakeEnv()
    out = export_episodes(env)
    assert out["observations"].shape == (50, 4)
    assert out["terminals"][24] and out["terminals"].sum() == 1
    assert out["maze_map"].shape == (3, 3)
    # floor boxes filtered: the thin huge one drops, the two walls remain
    assert out["mj_walls"].shape == (2, 4, 2)
    assert float(out["maze_size_scaling"]) == 4.0
    # the exported episodes drive the gym-free windowing unchanged
    occ = maze_map_to_occ(out["maze_map"])
    data = window_episodes(out["observations"], out["terminals"], occ,
                           T=8, num_samples=4, timeouts=out.get("timeouts"),
                           window_mode="random", with_velocity=True)
    assert data["x"].shape == (4, 8, 4)


def test_export_episodes_dones_fallback():
    class Env(_FakeEnv):
        def get_dataset(self):
            d = _FakeEnv.get_dataset(self)
            return {"observations": d["observations"], "dones": d["terminals"]}

    out = export_episodes(Env())
    assert out["terminals"].sum() == 1 and "timeouts" not in out


def test_prepare_prefers_exported_maze_map(tmp_path):
    """prepare_d4rl must use the npz's maze_map (live-env layout) so custom
    envs outside MAZE_SPECS work end-to-end."""
    import numpy as np

    from interpolated_diffusion_tpu.data.d4rl import main as prep_main

    ep = tmp_path / "ep.npz"
    n = 40
    obs = np.cumsum(np.full((n, 2), 0.02, np.float32), axis=0)
    np.savez(ep, observations=obs, terminals=np.zeros(n, bool),
             maze_map=np.array([[10, 10, 10], [10, 11, 10], [10, 10, 10]]))
    out = tmp_path / "prep.npz"
    prep_main(["--episodes", str(ep), "--env_id", "maze2d-custom-v9",
               "--out_path", str(out), "--T", "8", "--num_samples", "3",
               "--window_mode", "random", "--max_collision_rate", "1.0"])
    with np.load(out) as f:
        assert f["occ"].shape[-2:] == (3, 3)

    # without a maze_map, unknown env ids fail loudly
    ep2 = tmp_path / "ep2.npz"
    np.savez(ep2, observations=obs, terminals=np.zeros(n, bool))
    import pytest

    with pytest.raises(ValueError, match="maze_map"):
        prep_main(["--episodes", str(ep2), "--env_id", "maze2d-custom-v9",
                   "--out_path", str(tmp_path / "x.npz"), "--T", "8",
                   "--num_samples", "2"])
