"""Round-2 aux additions: RAM guard, decode retry, straightener loader,
latent-straightness / selector-per-maze / wan eval diagnostics."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)


def test_memguard():
    from interpolated_diffusion_tpu.utils.memguard import check_cpu_mem

    check_cpu_mem(0)        # disabled
    check_cpu_mem(100.0)    # cannot exceed 100%
    with pytest.raises(RuntimeError, match="max_cpu_mem_percent"):
        check_cpu_mem(0.01)


def test_raw_clip_dataset_retry(tmp_path, monkeypatch):
    from interpolated_diffusion_tpu.data import didemo

    anns = [
        {"video": "missing_clip", "caption": "a", "start_sec": 0.0, "end_sec": 2.0},
        {"video": "corrupt_clip", "caption": "b", "start_sec": 0.0, "end_sec": 2.0},
        {"video": "good_clip", "caption": "c", "start_sec": 0.0, "end_sec": 2.0},
    ]
    for name in ("corrupt_clip", "good_clip"):
        (tmp_path / f"{name}.mp4").write_bytes(b"x")

    def fake_read(path, start, end, T, frame_size):
        if "corrupt" in path:
            raise ValueError("decode failed")
        return np.zeros((T, 3, frame_size, frame_size), np.float32)

    monkeypatch.setattr(didemo, "read_video_clip", fake_read)
    ds = didemo.RawClipDataset(anns, str(tmp_path), T=4, frame_size=8)
    # idx 0: missing file -> corrupt decode -> lands on good_clip
    out = ds.get(0)
    assert out["video"] == "good_clip" and out["frames"].shape == (4, 3, 8, 8)

    # all-bad dataset: bounded retries then a clear error
    ds_bad = didemo.RawClipDataset(anns[:2], str(tmp_path), T=4, frame_size=8,
                                   max_retries=4)
    with pytest.raises(RuntimeError, match="no decodable clip"):
        ds_bad.get(0)


def test_straightener_loader_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from interpolated_diffusion_tpu.models.straightener import (
        LatentStraightener, load_latent_straightener,
    )
    from interpolated_diffusion_tpu.utils.checkpoint import save_checkpoint

    model = LatentStraightener(in_channels=3, hidden_channels=8, blocks=1)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
    params = model.init(jax.random.PRNGKey(1), z)["params"]
    meta = {"stage": "straightener", "arch": "conv", "in_channels": 3,
            "hidden_channels": 8, "blocks": 1, "token_patch": 4,
            "token_d_model": 32, "token_layers": 1}
    save_checkpoint(str(tmp_path / "ckpt_2"), params, None, 2, None, meta)

    model2, params2, meta2 = load_latent_straightener(
        str(tmp_path), sample_hw=(8, 8))
    out1 = model.apply({"params": params}, z)
    out2 = model2.apply({"params": params2}, z)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_diagnose_latent_straightness(tmp_path):
    import jax
    from interpolated_diffusion_tpu.diagnostics.diagnose_latent_straightness import (
        main as straight_main, sample_triplets,
    )
    from interpolated_diffusion_tpu.models.straightener import LatentStraightener
    from interpolated_diffusion_tpu.utils.checkpoint import save_checkpoint

    t0, t1, t, alpha = sample_triplets(64, 8, 2, np.random.RandomState(0))
    assert ((t1 - t0) >= 2).all() and (t > t0).all() and (t < t1).all()
    assert (alpha > 0).all() and (alpha < 1).all()

    model = LatentStraightener(in_channels=2, hidden_channels=8, blocks=1)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 2, 4, 4), np.float32))["params"]
    save_checkpoint(str(tmp_path / "ckpt_1"), params, None, 1, None,
                    {"stage": "straightener", "arch": "conv",
                     "in_channels": 2, "hidden_channels": 8, "blocks": 1})
    agg = straight_main([
        "--T", "6", "--latent_c", "2", "--latent_h", "4", "--latent_w", "4",
        "--batch", "4", "--num_batches", "2", "--num_samples", "8",
        "--text_len", "4", "--text_dim", "8",
        "--straightener_ckpt", str(tmp_path),
    ])
    for k in ("lerp", "copy", "curv", "s_lerp", "z_from_s"):
        assert np.isfinite(agg[k]).all(), k


def test_diagnose_selector_per_maze(tmp_path):
    from interpolated_diffusion_tpu.data.prepare_dp_keypoints import main as prep_main
    from interpolated_diffusion_tpu.train.train_keypoint_selector import main as sel_main
    from interpolated_diffusion_tpu.diagnostics.diagnose_selector_per_maze import (
        main as diag_main,
    )

    npz = str(tmp_path / "dp.npz")
    prep_main(["--out_path", npz, "--T", "16", "--K", "3", "--num_samples", "24",
               "--batch", "12", "--maze_h", "9", "--maze_w", "9",
               "--store_kp_mask_levels", "1", "--levels", "2"])
    sel_dir = str(tmp_path / "sel")
    sel_main(["--dataset", "prepared", "--prepared_path", npz, "--T", "16",
              "--K", "3", "--levels", "2", "--use_level", "1",
              "--batch", "8", "--steps", "2", "--save_every", "2",
              "--log_every", "1", "--maze_h", "9", "--maze_w", "9",
              "--maze_channels", "8,8", "--bf16", "0", "--steps_per_call", "1",
              "--d_model", "32", "--n_heads", "2", "--d_ff", "64",
              "--out_dir", sel_dir])
    report = diag_main(["--ckpt", os.path.join(sel_dir, "ckpt_2"),
                        "--eval_npz", npz, "--batch_per_maze", "4",
                        "--max_mazes", "2"])
    assert len(report) == 2
    for maze in report:
        assert 0.0 <= maze["overlap"] <= 1.0 and np.isfinite(maze["mae"])


def test_eval_wan_fullseq_and_sla_gap():
    from interpolated_diffusion_tpu.diagnostics.eval_wan_fullseq_eps import (
        main as fullseq_main,
    )
    from interpolated_diffusion_tpu.diagnostics.eval_wan_sla_gap import (
        main as gap_main,
    )

    tiny = ["--num_samples", "4", "--T", "5", "--latent_c", "4",
            "--latent_h", "8", "--latent_w", "8", "--text_len", "4",
            "--text_dim", "32", "--wan_dim", "32", "--wan_layers", "1",
            "--wan_heads", "2", "--wan_ffn", "64", "--bf16", "0",
            "--batch", "2", "--max_batches", "2", "--N_train", "50"]
    ema = fullseq_main(tiny + ["--attn_mode", "dense"])
    assert np.isfinite(ema) and ema > 0

    r = gap_main(tiny + ["--attn_mode", "sla", "--sla_block", "8",
                         "--sla_topk", "0.5"])
    assert np.isfinite(r["mse_dense_eps"])
    assert np.isfinite(r["mse_sla_vs_dense"])
    # zero-init linear branch + high topk: the sparse path stays close to
    # dense relative to the eps-MSE scale
    assert r["mse_sla_vs_dense"] < r["mse_dense_eps"]


def test_maze2d_synth_to_unified_dp_route(tmp_path):
    """Gym-free D4RL route: synthesize maze2d episodes -> window/normalize ->
    pad-unify envs -> DP-annotate. The reference's unified pipeline
    (scripts/datasets/d4rl + prepare_dp_keypoints) without the gym stack."""
    from interpolated_diffusion_tpu.data.maze2d_synth import main as synth
    from interpolated_diffusion_tpu.data.d4rl import main as prep, main_unified
    from interpolated_diffusion_tpu.data.prepare_dp_keypoints import main as dpk

    ep_u, ep_m = str(tmp_path / "ep_u.npz"), str(tmp_path / "ep_m.npz")
    synth(["--env_id", "maze2d-umaze-v1", "--n_episodes", "4",
           "--max_steps", "200", "--out_path", ep_u])
    synth(["--env_id", "maze2d-medium-v1", "--n_episodes", "4",
           "--max_steps", "300", "--out_path", ep_m])
    pu, pm = str(tmp_path / "p_u.npz"), str(tmp_path / "p_m.npz")
    for ep, out, env in ((ep_u, pu, "maze2d-umaze-v1"),
                         (ep_m, pm, "maze2d-medium-v1")):
        prep(["--episodes", ep, "--env_id", env, "--out_path", out,
              "--T", "24", "--num_samples", "8", "--with_velocity", "1",
              "--window_mode", "random", "--max_collision_rate", "0.2"])
    uni = str(tmp_path / "uni.npz")
    main_unified(["--inputs", pu, pm, "--out_path", uni, "--use_sdf", "1"])
    dp = str(tmp_path / "uni_dp.npz")
    dpk(["--prepared_path", uni, "--out_path", dp, "--T", "24", "--K", "4",
         "--batch", "16", "--use_sdf", "1",
         "--store_kp_mask_levels", "1", "--levels", "2"])

    f = np.load(dp)
    assert f["x"].shape == (16, 24, 4) and f["kp_idx"].shape == (16, 4)
    assert f["kp_mask_levels"].shape == (16, 3, 24)
    # positions normalized to [0,1]; unified grid is the max (8x8) grid
    assert f["occ"].shape[-2:] == (8, 8)
    assert f["x"][..., :2].min() >= 0.0 and f["x"][..., :2].max() <= 1.0
    # trajectories must stay out of walls on the unified grid
    h, w = f["occ"].shape[-2:]
    j = np.clip(np.round(f["x"][:, :, 0] * (w - 1)).astype(int), 0, w - 1)
    i = np.clip(np.round(f["x"][:, :, 1] * (h - 1)).astype(int), 0, h - 1)
    coll = f["occ"][np.arange(16)[:, None], 0, i, j] > 0.5
    assert coll.mean() <= 0.05


def test_attn_tuning_registry(tmp_path, monkeypatch):
    import json

    from interpolated_diffusion_tpu.kernels import tuning

    # inert without the env var
    monkeypatch.delenv(tuning._ENV, raising=False)
    assert tuning.flash_blocks() == (512, 1024)

    p = tmp_path / "tune.json"
    p.write_text(json.dumps({"flash": {"best_fwd": "256x2048",
                                       "best_grad": "1024x512"}}))
    monkeypatch.setenv(tuning._ENV, str(p))
    assert tuning.flash_blocks() == (1024, 512)          # grad preferred
    assert tuning.flash_blocks(prefer="best_fwd") == (256, 2048)

    # missing kernel entry / unparseable file -> defaults, no crash
    p2 = tmp_path / "empty.json"
    p2.write_text("{}")
    monkeypatch.setenv(tuning._ENV, str(p2))
    assert tuning.flash_blocks(128, 128) == (128, 128)
    p3 = tmp_path / "garbage.json"
    p3.write_text("not json")
    monkeypatch.setenv(tuning._ENV, str(p3))
    assert tuning.flash_blocks() == (512, 1024)
