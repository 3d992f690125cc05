"""Aux-systems tests: DiDeMo caches + trainers, teacher shards, diagnostics,
visualization, Stage-1-only sampler, stage1 caching, experiment logging."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)


def test_didemo_annotation_parsing(tmp_path):
    from interpolated_diffusion_tpu.data.didemo import (
        load_didemo_annotations, load_lsmdc_annotations, mode_time_pair,
        parse_timecode,
    )

    assert mode_time_pair([[0, 0], [1, 1], [0, 0]]) == (0, 0)
    assert abs(parse_timecode("01.02.03.500") - 3723.5) < 1e-6
    ann = [{"video": "a.mp4", "description": "cap",
            "times": [[1, 1], [1, 1], [2, 3]]}]
    with open(tmp_path / "train_data.json", "w") as f:
        json.dump(ann, f)
    out = load_didemo_annotations(str(tmp_path), "train")
    assert out[0]["start_sec"] == 5.0 and out[0]["end_sec"] == 10.0
    with open(tmp_path / "anns.csv", "w") as f:
        f.write("clip1\tx\t00.00.01.000\t00.00.03.000\tx\tsome caption\n")
    out = load_lsmdc_annotations(str(tmp_path / "anns.csv"))
    assert out[0]["caption"] == "some caption"
    assert out[0]["end_sec"] == 3.0


def test_clip_cache_roundtrip_and_didemo_trainers(tmp_path):
    from interpolated_diffusion_tpu.data.didemo import CachedClipDataset, write_clip_cache

    samples = [{"latents": np.random.randn(6, 3, 8, 8).astype(np.float32),
                "text_embed": np.random.randn(2, 16).astype(np.float32)}
               for _ in range(10)]
    write_clip_cache(str(tmp_path / "cache"), "train", samples, shard_size=4)
    ds = CachedClipDataset(str(tmp_path / "cache"), "train")
    assert len(ds) == 10
    np.testing.assert_allclose(ds.get(5)["latents"], samples[5]["latents"])
    batch = ds.get_batch([1, 7, 9])
    assert batch["latents"].shape == (3, 6, 3, 8, 8)

    from interpolated_diffusion_tpu.train.train_keypoints_didemo import main as kp_main
    from interpolated_diffusion_tpu.train.train_interp_levels_didemo import main as il_main

    tiny = ["--cache_dir", str(tmp_path / "cache"), "--K", "3",
            "--patch_size", "2", "--d_model", "32", "--n_layers", "2",
            "--n_heads", "2", "--d_ff", "64", "--batch", "2", "--steps", "2",
            "--save_every", "2", "--log_every", "1", "--bf16", "0"]
    kp_main(tiny + ["--out_dir", str(tmp_path / "kp")])
    assert os.path.exists(tmp_path / "kp" / "ckpt_2" / "meta.json")
    il_main(["--cache_dir", str(tmp_path / "cache"), "--K_min", "3",
             "--levels", "2", "--patch_size", "2", "--d_model", "32",
             "--n_layers", "2", "--n_heads", "2", "--d_ff", "64",
             "--batch", "2", "--steps", "2", "--save_every", "2",
             "--log_every", "1", "--bf16", "0",
             "--out_dir", str(tmp_path / "il")])
    assert os.path.exists(tmp_path / "il" / "ckpt_2" / "meta.json")


def test_synthetic_clip_cache_prep(tmp_path):
    from interpolated_diffusion_tpu.data.precompute_clip_cache import main
    from interpolated_diffusion_tpu.data.didemo import CachedClipDataset

    main(["--cache_dir", str(tmp_path / "c"), "--synthetic", "1",
          "--max_samples", "6", "--T", "4"])
    ds = CachedClipDataset(str(tmp_path / "c"), "train")
    assert len(ds) == 6
    assert ds.get(0)["latents"].shape == (4, 3, 16, 16)


def test_teacher_shards(tmp_path):
    from interpolated_diffusion_tpu.data.wan_synth import (
        SyntheticWanDataset, WanSynthTarDataset, write_tar_shard,
    )
    from interpolated_diffusion_tpu.teachers.teacher import precompute_teacher_shards

    ds = SyntheticWanDataset(n_samples=4, T=5, C=2, H=4, W=4, text_len=2,
                             text_dim=4)
    data_root = str(tmp_path / "data")
    write_tar_shard(os.path.join(data_root, "teacher_00000.tar"),
                    [{"__key__": f"{i:04d}", **ds.get(i)} for i in range(4)])
    out_root = str(tmp_path / "teacher")
    n = precompute_teacher_shards(data_root, out_root, T=5, shard_size=4)
    assert n == 4
    joined = WanSynthTarDataset(data_root, T=5, shuffle_shards=False,
                                shuffle_buffer=1, teacher_root=out_root,
                                process_split=False)
    sample = next(iter(joined))
    assert "teacher_latents" in sample


def test_diagnostics_run(tmp_path):
    from interpolated_diffusion_tpu.diagnostics.diagnose_stage2_masks import main as masks_main
    from interpolated_diffusion_tpu.diagnostics.diagnose_oracle_dp import main as dp_main
    from interpolated_diffusion_tpu.diagnostics.eval_interpolators import main as ev_main

    r = masks_main(["--T", "16", "--K_min", "3", "--levels", "2", "--batch", "32"])
    assert r["random_nested"]["nestedness_violations"] == 0
    r = dp_main(["--T", "9", "--K", "3", "--batch", "16", "--latent_c", "2",
                 "--latent_h", "4", "--latent_w", "4"])
    assert r["unique_index_positions"] >= 3
    r = ev_main(["--interpolator", "lerp", "--T", "9", "--K", "3",
                 "--latent_c", "2", "--latent_h", "4", "--latent_w", "4",
                 "--batch", "2", "--num_batches", "2"])
    assert abs(r["latent_l1"] - r["lerp_l1"]) < 1e-9  # lerp vs itself


def test_visualize_and_metrics_plots(tmp_path):
    from interpolated_diffusion_tpu.eval.visualize import (
        plot_occupancy_trajectories, save_sample_grid,
    )

    occ = np.zeros((9, 9), np.float32)
    occ[4, 2:7] = 1
    traj = np.stack([np.linspace(0.1, 0.9, 16), np.linspace(0.1, 0.9, 16)], 1)
    out = plot_occupancy_trajectories(
        occ, [traj], labels=["pred"], start_goal=np.array([0.1, 0.1, 0.9, 0.9]),
        out_path=str(tmp_path / "t.png"))
    assert os.path.exists(out)
    out = save_sample_grid(occ[None, None].repeat(2, 0),
                           {"a": [traj, traj], "b": [traj, traj]},
                           str(tmp_path / "grid.png"))
    assert os.path.exists(out)


def test_sample_keypoints_and_stage1_cache(tmp_path):
    from interpolated_diffusion_tpu.train.train_keypoints import main as kp_main

    tiny = ["--T", "32", "--batch", "16", "--num_samples", "64",
            "--d_model", "32", "--n_layers", "2", "--n_heads", "2",
            "--d_ff", "64", "--maze_channels", "8,8", "--maze_h", "9",
            "--maze_w", "9", "--log_every", "2", "--bf16", "0", "--steps_per_call", "1",
            "--K", "4", "--steps", "2", "--save_every", "2"]
    kp_dir = str(tmp_path / "kp")
    kp_main(tiny + ["--out_dir", kp_dir])

    from interpolated_diffusion_tpu.sample.sample_keypoints import main as sk_main

    s = sk_main(["--kp_ckpt", os.path.join(kp_dir, "ckpt_2"),
                 "--num_batches", "1", "--batch", "8", "--num_samples", "64",
                 "--maze_h", "9", "--maze_w", "9", "--ddim_steps", "4",
                 "--bf16", "0", "--out_dir", str(tmp_path / "skp")])
    assert "collision_rate" in s
    assert os.path.exists(tmp_path / "skp" / "samples.png")

    # stage1 cache: save then load produces identical refined outputs
    from interpolated_diffusion_tpu.train.train_interp_levels import main as il_main
    from interpolated_diffusion_tpu.sample.generate import main as gen_main

    il_dir = str(tmp_path / "il")
    il_main(tiny[:20] + ["--K_min", "4", "--levels", "2", "--mode", "x0",
                         "--steps", "2", "--save_every", "2",
                         "--out_dir", il_dir])
    common = ["--kp_ckpt", os.path.join(kp_dir, "ckpt_2"),
              "--interp_ckpt", os.path.join(il_dir, "ckpt_2"),
              "--num_batches", "1", "--batch", "4", "--num_samples", "64",
              "--maze_h", "9", "--maze_w", "9", "--bf16", "0",
              "--stage1_cache", str(tmp_path / "s1c")]
    s1 = gen_main(common + ["--stage1_cache_mode", "save",
                            "--out_dir", str(tmp_path / "g1")])
    s2 = gen_main(common + ["--stage1_cache_mode", "load",
                            "--out_dir", str(tmp_path / "g2")])
    assert abs(s1["interp_mse_to_gt"] - s2["interp_mse_to_gt"]) < 1e-6


def test_log_experiment_script(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    summary = {"collision": 0.12345, "success": 1.0}
    with open(tmp_path / "summary.json", "w") as f:
        json.dump(summary, f)
    log_rel = os.path.relpath(tmp_path / "LOG.md", repo)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "log_experiment.py"),
         "--title", "test exp", "--results", str(tmp_path / "summary.json"),
         "--log_path", log_rel, "--notes", "hello"],
        capture_output=True, text=True, cwd=repo,
    )
    assert r.returncode == 0, r.stderr
    content = open(tmp_path / "LOG.md").read()
    assert "test exp" in content and "0.12345" in content


def test_sampler_viz_exports(tmp_path):
    """samples.npz carries occ/start_goal and the rerender script replots
    from it alone (reference npz-rerender parity)."""
    import numpy as np
    import scripts.rerender_npz as rr

    B, T, K, G = 2, 16, 4, 9
    rng = np.random.default_rng(0)
    npz = tmp_path / "samples.npz"
    np.savez(npz,
             interp=rng.random((B, T, 2)), refined=rng.random((B, T, 2)),
             gt=rng.random((B, T, 2)), keypoints=rng.random((B, K, 2)),
             idx=np.tile(np.linspace(0, T - 1, K, dtype=np.int64), (B, 1)),
             occ=(rng.random((B, 1, G, G)) < 0.2).astype(np.float32),
             start_goal=rng.random((B, 4)))
    out = tmp_path / "plots"
    rr.main(["--npz", str(npz), "--out", str(out), "-n", "2"])
    assert sorted(p.name for p in out.iterdir()) == ["sample_000.png",
                                                     "sample_001.png"]
