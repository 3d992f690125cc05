"""End-to-end trainer + sampler smoke tests (tiny models, CPU mesh).

The reference has no trainer tests; these are the integration layer the TPU
build adds: Stage-1 train → Stage-2 train (with bootstrap) → jitted
generation pipeline → metrics, all through the real CLIs.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)


@pytest.fixture(scope="module")
def tmp_run(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


TINY = [
    "--T", "32", "--batch", "16", "--num_samples", "64",
    "--d_model", "32", "--n_layers", "2", "--n_heads", "2", "--d_ff", "64",
    "--maze_channels", "8,8", "--maze_h", "9", "--maze_w", "9",
    "--log_every", "2", "--bf16", "0", "--steps_per_call", "1",
]


def test_train_keypoints_and_resume(tmp_run):
    from interpolated_diffusion_tpu.train.train_keypoints import main

    out = str(tmp_run / "kp")
    main(TINY + ["--K", "4", "--steps", "4", "--save_every", "4", "--out_dir", out])
    assert os.path.exists(os.path.join(out, "ckpt_4", "meta.json"))
    # resume continues from step 4
    main(TINY + ["--K", "4", "--steps", "6", "--save_every", "6", "--out_dir", out,
                 "--resume", out])
    assert os.path.exists(os.path.join(out, "ckpt_6"))


def test_train_interp_levels_modes(tmp_run):
    from interpolated_diffusion_tpu.train.train_interp_levels import main

    out = str(tmp_run / "il")
    main(TINY + ["--K_min", "4", "--levels", "2", "--mode", "adj",
                 "--anchor_conf", "1", "--anchor_conf_anneal", "1",
                 "--corrupt_mode", "dist", "--corrupt_sigma_max", "0.05",
                 "--steps", "3", "--save_every", "3", "--out_dir", out])
    assert os.path.exists(os.path.join(out, "ckpt_3", "meta.json"))
    out_x0 = str(tmp_run / "il_x0")
    main(TINY + ["--K_min", "4", "--levels", "2", "--mode", "x0",
                 "--steps", "2", "--save_every", "2", "--out_dir", out_x0])
    out_causal = str(tmp_run / "il_causal")
    main(TINY + ["--K_min", "4", "--levels", "2", "--mode", "adj", "--causal", "1",
                 "--steps", "2", "--save_every", "2", "--out_dir", out_causal])


def test_train_interp_levels_bootstrap(tmp_run):
    from interpolated_diffusion_tpu.train.train_interp_levels import main

    kp_ckpt = str(tmp_run / "kp" / "ckpt_6")
    out = str(tmp_run / "il_boot")
    main(TINY + ["--K_min", "4", "--levels", "2", "--mode", "adj",
                 "--bootstrap_ckpt", kp_ckpt, "--bootstrap_ddim_steps", "3",
                 "--steps", "2", "--save_every", "2", "--out_dir", out])
    assert os.path.exists(os.path.join(out, "ckpt_2"))
    # best-of bootstrap: student anchors drawn from the sampler's
    # best-of-N/dp distribution (both selection modes)
    for mode in ("dp", "collision"):
        out_bo = str(tmp_run / f"il_boot_{mode}")
        main(TINY + ["--K_min", "4", "--levels", "2", "--mode", "adj",
                     "--bootstrap_ckpt", kp_ckpt, "--bootstrap_ddim_steps", "3",
                     "--bootstrap_best_of", "3",
                     "--bootstrap_best_of_mode", mode,
                     "--bootstrap_warmup_steps", "1",
                     "--steps", "2", "--save_every", "2", "--out_dir", out_bo])
        import json
        meta = json.load(open(os.path.join(out_bo, "ckpt_2", "meta.json")))
        assert meta["meta"]["bootstrap_best_of"] == 3


def test_generate_causal_pipeline(tmp_run):
    from interpolated_diffusion_tpu.sample.generate_causal import main

    out = str(tmp_run / "gen_causal")
    summary = main([
        "--kp_ckpt", str(tmp_run / "kp" / "ckpt_6"),
        "--interp_ckpt", str(tmp_run / "il_causal" / "ckpt_2"),
        "--chunk", "8", "--K_min", "3", "--ddim_steps", "4",
        "--num_batches", "2", "--batch", "4", "--num_samples", "64",
        "--maze_h", "9", "--maze_w", "9", "--bf16", "0", "--out_dir", out,
    ])
    assert os.path.exists(os.path.join(out, "metrics.csv"))
    assert "collision_rate" in summary
    # FORA-cached chunk DDIM runs end-to-end too
    summary2 = main([
        "--kp_ckpt", str(tmp_run / "kp" / "ckpt_6"),
        "--interp_ckpt", str(tmp_run / "il_causal" / "ckpt_2"),
        "--chunk", "8", "--K_min", "3", "--ddim_steps", "4",
        "--stage1_cache_interval", "2",
        "--num_batches", "1", "--batch", "4", "--num_samples", "64",
        "--maze_h", "9", "--maze_w", "9", "--bf16", "0",
        "--out_dir", str(tmp_run / "gen_causal_fora"),
    ])
    assert np.isfinite(summary2["collision_rate"])
    # PFDiff chunk solver runs end-to-end too
    summary3 = main([
        "--kp_ckpt", str(tmp_run / "kp" / "ckpt_6"),
        "--interp_ckpt", str(tmp_run / "il_causal" / "ckpt_2"),
        "--chunk", "8", "--K_min", "3", "--ddim_steps", "4",
        "--stage1_solver", "pfdiff",
        "--num_batches", "1", "--batch", "4", "--num_samples", "64",
        "--maze_h", "9", "--maze_w", "9", "--bf16", "0",
        "--out_dir", str(tmp_run / "gen_causal_pfdiff"),
    ])
    assert np.isfinite(summary3["collision_rate"])


def test_generate_pipeline_and_metrics(tmp_run):
    from interpolated_diffusion_tpu.sample.generate import main

    out = str(tmp_run / "gen")
    summary = main([
        "--kp_ckpt", str(tmp_run / "kp" / "ckpt_6"),
        "--interp_ckpt", str(tmp_run / "il" / "ckpt_3"),
        "--num_batches", "2", "--batch", "8", "--num_samples", "64",
        "--maze_h", "9", "--maze_w", "9",
        "--compare_oracle", "1", "--bf16", "0", "--out_dir", out,
    ])
    assert os.path.exists(os.path.join(out, "metrics.csv"))
    assert os.path.exists(os.path.join(out, "samples.npz"))
    # oracle interp from GT anchors must beat student interp on MSE-to-GT
    assert summary["oracle_interp_mse_to_gt"] <= summary["interp_mse_to_gt"] + 1e-6
    # endpoints are hard-clamped -> goal distance ~ 0 and success = 1
    assert summary["refined_goal_dist"] < 1e-4
    with np.load(os.path.join(out, "samples.npz")) as f:
        assert f["refined"].shape == (16, 32, 2)
        assert f["idx"].shape == (16, 4)


def test_train_keypoints_dphi_feat_and_sampler_gate(tmp_run):
    """kp_feat_dim=5 with D_phi cost channels: D_phi -> Stage-1 --dphi_ckpt ->
    generate refuses without --dphi_ckpt (meta kp_feat_dphi) and runs with it."""
    from interpolated_diffusion_tpu.sample.generate import main as gen_main
    from interpolated_diffusion_tpu.train.train_keypoints import main as kp_main
    from interpolated_diffusion_tpu.train.train_segment_cost import main as sc_main

    sc_out = str(tmp_run / "dphi")
    sc_main(["--T", "32", "--batch", "8", "--num_samples", "64",
             "--maze_channels", "8,8", "--maze_h", "9", "--maze_w", "9",
             "--hidden_dim", "32", "--n_layers_mlp", "2",
             "--t_steps", "4", "--segment_cost_samples", "4",
             "--bf16", "0", "--steps_per_call", "1", "--log_every", "2",
             "--steps", "3", "--save_every", "3", "--out_dir", sc_out])
    kp_out = str(tmp_run / "kp_dphi")
    kp_main(TINY + ["--K", "4", "--use_kp_feat", "1", "--kp_feat_dim", "5",
                    "--dphi_ckpt", sc_out,
                    "--steps", "2", "--save_every", "2", "--out_dir", kp_out])
    gen_args = [
        "--kp_ckpt", kp_out, "--interp_ckpt", str(tmp_run / "il" / "ckpt_3"),
        "--num_batches", "1", "--batch", "4", "--num_samples", "64",
        "--maze_h", "9", "--maze_w", "9", "--bf16", "0",
        "--out_dir", str(tmp_run / "gen_dphi"),
    ]
    with pytest.raises(ValueError, match="kp_feat_dphi"):
        gen_main(gen_args)
    summary = gen_main(gen_args + ["--dphi_ckpt", sc_out])
    assert "refined_collision_rate" in summary


def test_train_interp_levels_mask_policy_mix(tmp_run):
    """Per-sample weighted mask-policy mix (reference --mask_policy_mix)."""
    from interpolated_diffusion_tpu.train.train_interp_levels import main

    out = str(tmp_run / "il_mix")
    main(TINY + ["--K_min", "4", "--levels", "2", "--mode", "adj",
                 "--mask_policy_mix", "uniform:0.6,random:0.4",
                 "--steps", "3", "--save_every", "3", "--out_dir", out])
    assert os.path.exists(os.path.join(out, "ckpt_3", "meta.json"))
    import json

    meta = json.load(open(os.path.join(out, "ckpt_3", "meta.json")))
    assert meta["meta"]["mask_policy_mix"] == "uniform:0.6,random:0.4"


@pytest.mark.parametrize("mode", ["dp", "set"])
def test_generate_causal_best_of(tmp_run, mode):
    from interpolated_diffusion_tpu.sample.generate_causal import main

    summary = main([
        "--kp_ckpt", str(tmp_run / "kp" / "ckpt_6"),
        "--interp_ckpt", str(tmp_run / "il_causal" / "ckpt_2"),
        "--chunk", "8", "--K_min", "3", "--ddim_steps", "4",
        "--stage1_best_of", "4", "--stage1_best_of_mode", mode,
        "--num_batches", "1", "--batch", "4", "--num_samples", "64",
        "--maze_h", "9", "--maze_w", "9", "--bf16", "0",
        "--out_dir", str(tmp_run / f"gen_causal_{mode}"),
    ])
    assert np.isfinite(summary["collision_rate"])


def test_rf_objective_train_and_sample(tmp_path):
    """Rectified-flow Stage-1: train with --objective rf, then both samplers
    integrate the velocity field (meta-driven) with known-endpoint clamping."""
    from interpolated_diffusion_tpu.sample.generate import main as gen_main
    from interpolated_diffusion_tpu.sample.sample_keypoints import (
        main as kp_sample_main,
    )
    from interpolated_diffusion_tpu.train.train_interp_levels import (
        main as il_main,
    )
    from interpolated_diffusion_tpu.train.train_keypoints import main

    kp = str(tmp_path / "kp_rf")
    main(TINY + ["--K", "4", "--objective", "rf", "--steps", "4",
                 "--save_every", "4", "--out_dir", kp])
    il = str(tmp_path / "il")
    il_main(TINY + ["--K_min", "4", "--levels", "2", "--mode", "adj",
                    "--steps", "2", "--save_every", "2", "--out_dir", il])

    out = str(tmp_path / "gen_rf")
    gen_main([
        "--kp_ckpt", kp, "--interp_ckpt", il,
        "--num_batches", "1", "--batch", "4", "--num_samples", "64",
        "--ddim_steps", "4",
        "--maze_h", "9", "--maze_w", "9", "--bf16", "0", "--out_dir", out,
    ])
    assert os.path.exists(os.path.join(out, "summary.json"))

    out2 = str(tmp_path / "kp_rf_samples")
    summary = kp_sample_main([
        "--kp_ckpt", kp, "--num_batches", "1", "--batch", "4",
        "--num_samples", "64", "--ddim_steps", "4", "--plots", "0",
        "--maze_h", "9", "--maze_w", "9", "--bf16", "0", "--out_dir", out2,
    ])
    assert np.isfinite(summary["mse_to_gt"])

    # eps-family solver knobs must refuse to silently apply to rf ckpts
    import pytest

    with pytest.raises(ValueError, match="rf checkpoints"):
        gen_main([
            "--kp_ckpt", kp, "--interp_ckpt", il,
            "--num_batches", "1", "--batch", "4", "--num_samples", "64",
            "--stage1_solver", "dpm", "--ddim_steps", "4",
            "--maze_h", "9", "--maze_w", "9", "--bf16", "0",
            "--out_dir", str(tmp_path / "gen_rf_bad"),
        ])


def test_reflow_distillation(tmp_path):
    """ReFlow: train rf teacher -> distill on its (noise, generated)
    couplings -> the student still trains and samples; eps teachers are
    rejected."""
    from interpolated_diffusion_tpu.sample.sample_keypoints import (
        main as kp_sample_main,
    )
    from interpolated_diffusion_tpu.train.train_keypoints import main

    teacher = str(tmp_path / "kp_rf_teacher")
    main(TINY + ["--K", "4", "--objective", "rf", "--steps", "3",
                 "--save_every", "3", "--out_dir", teacher])

    student = str(tmp_path / "kp_rf_student")
    main(TINY + ["--K", "4", "--objective", "rf",
                 "--reflow_teacher", teacher, "--reflow_steps", "4",
                 "--steps", "2", "--save_every", "2", "--out_dir", student])
    out = str(tmp_path / "student_samples")
    summary = kp_sample_main([
        "--kp_ckpt", student, "--num_batches", "1", "--batch", "4",
        "--num_samples", "64", "--ddim_steps", "2", "--plots", "0",
        "--maze_h", "9", "--maze_w", "9", "--bf16", "0", "--out_dir", out,
    ])
    assert np.isfinite(summary["mse_to_gt"])

    eps_ckpt = str(tmp_path / "kp_eps")
    main(TINY + ["--K", "4", "--steps", "2", "--save_every", "2",
                 "--out_dir", eps_ckpt])
    with pytest.raises(ValueError, match="objective=rf"):
        main(TINY + ["--K", "4", "--objective", "rf",
                     "--reflow_teacher", eps_ckpt,
                     "--steps", "2", "--save_every", "2",
                     "--out_dir", str(tmp_path / "bad")])
