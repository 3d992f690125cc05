"""Selection subsystem e2e: DP prep → D_phi → selector → selector-driven
Stage-1/Stage-2 training and sampling (tiny models, CPU)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpolated_diffusion_tpu.ops.selection import (

    build_cost_matrix_from_segments,
    build_kp_feat_batch,
    build_segment_precompute,
    compute_segment_costs_batch,
    dp_select_indices_batch,
)


pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)

@pytest.fixture(scope="module")
def prep_npz(tmp_path_factory):
    out = tmp_path_factory.mktemp("prep") / "dp.npz"
    from interpolated_diffusion_tpu.data.prepare_dp_keypoints import main

    main(["--out_path", str(out), "--T", "32", "--K", "4", "--num_samples", "96",
          "--batch", "48", "--maze_h", "9", "--maze_w", "9",
          "--store_kp_mask_levels", "1", "--levels", "2"])
    return str(out)


def test_dp_straight_line_prefers_sparse_anchors():
    """On a perfectly straight trajectory every segmentation costs ~0; DP must
    still return a valid strictly-increasing path with endpoints."""
    T, K = 16, 4
    x = jnp.linspace(0.0, 1.0, T)[None, :, None].repeat(2, -1)
    pre = build_segment_precompute(T, 4)
    C = build_cost_matrix_from_segments(compute_segment_costs_batch(x, pre), pre, T)
    idx = np.asarray(dp_select_indices_batch(C, K))
    assert idx[0, 0] == 0 and idx[0, -1] == T - 1
    assert np.all(np.diff(idx[0]) > 0)


def test_dp_puts_anchor_at_corner():
    """An L-shaped path needs an anchor at the corner to reach near-zero cost."""
    T, K = 17, 3
    mid = T // 2
    pos = np.zeros((T, 2), np.float32)
    pos[: mid + 1, 0] = np.linspace(0, 1, mid + 1)
    pos[mid:, 0] = 1.0
    pos[mid:, 1] = np.linspace(0, 1, T - mid)
    x = jnp.asarray(pos)[None]
    pre = build_segment_precompute(T, 8)
    C = build_cost_matrix_from_segments(compute_segment_costs_batch(x, pre), pre, T)
    idx = np.asarray(dp_select_indices_batch(C, K))[0]
    assert idx[1] == mid, f"expected corner anchor at {mid}, got {idx}"


def test_kp_feat_values():
    idx = jnp.array([[0, 4, 8]], dtype=jnp.int32)
    feat = np.asarray(build_kp_feat_batch(idx, 9))
    np.testing.assert_allclose(feat[0, :, 2], [0.0, 0.5, 1.0])
    np.testing.assert_allclose(feat[0, :, 0], [0.0, 0.5, 0.5])  # left gaps
    np.testing.assert_allclose(feat[0, :, 1], [0.5, 0.5, 0.0])  # right gaps


def test_prepared_npz_contents(prep_npz):
    with np.load(prep_npz) as f:
        assert f["kp_idx"].shape == (96, 4)
        assert f["kp_feat"].shape == (96, 4, 3)
        assert f["kp_mask_levels"].shape == (96, 3, 32)
        idx = f["kp_idx"]
        assert np.all(idx[:, 0] == 0) and np.all(idx[:, -1] == 31)
        assert np.all(np.diff(idx, axis=1) > 0)
        # level masks contain exactly K_s anchors
        counts = f["kp_mask_levels"].sum(-1)
        assert np.all(counts[:, 2] == 4) and np.all(counts[:, 1] == 8) and np.all(counts[:, 0] == 16)


def test_dphi_selector_and_selector_driven_training(prep_npz, tmp_path):
    from interpolated_diffusion_tpu.train.train_segment_cost import main as sc_main
    from interpolated_diffusion_tpu.train.train_keypoint_selector import main as sel_main
    from interpolated_diffusion_tpu.train.train_keypoints import main as kp_main
    from interpolated_diffusion_tpu.train.train_interp_levels import main as il_main

    common = ["--dataset", "prepared", "--prepared_path", prep_npz, "--T", "32",
              "--batch", "16", "--steps", "2", "--save_every", "2", "--log_every", "1",
              "--maze_h", "9", "--maze_w", "9", "--maze_channels", "8,8", "--bf16", "0",
              "--steps_per_call", "1"]
    sc_dir = str(tmp_path / "sc")
    sc_main(common + ["--hidden_dim", "32", "--out_dir", sc_dir])
    assert os.path.exists(os.path.join(sc_dir, "ckpt_2", "meta.json"))

    sel_dir = str(tmp_path / "sel")
    sel_main(common + ["--K", "4", "--d_model", "32", "--n_heads", "2", "--d_ff", "64",
                       "--levels", "2", "--use_level", "1", "--out_dir", sel_dir])
    sel_ckpt = os.path.join(sel_dir, "ckpt_2")
    assert os.path.exists(os.path.join(sel_ckpt, "meta.json"))

    # Stage-1 with mixed dp/selector/random policy
    kp_dir = str(tmp_path / "kp")
    kp_main(common + ["--K", "4", "--d_model", "32", "--n_layers", "2", "--n_heads", "2",
                      "--d_ff", "64", "--idx_policy", "dp:0.4,selector:0.3,random:0.3",
                      "--selector_ckpt", sel_ckpt, "--out_dir", kp_dir])
    assert os.path.exists(os.path.join(kp_dir, "ckpt_2"))

    # Stage-2 with selector-level mask policy
    il_dir = str(tmp_path / "il")
    il_main(common + ["--K_min", "4", "--levels", "2", "--mode", "adj",
                      "--d_model", "32", "--n_layers", "2", "--n_heads", "2", "--d_ff", "64",
                      "--mask_policy", "selector_level", "--selector_ckpt", sel_ckpt,
                      "--out_dir", il_dir])
    assert os.path.exists(os.path.join(il_dir, "ckpt_2"))

    # sampler with selector keypoints + selector stage-2 masks
    from interpolated_diffusion_tpu.sample.generate import main as gen_main

    summary = gen_main([
        "--kp_ckpt", os.path.join(kp_dir, "ckpt_2"),
        "--interp_ckpt", os.path.join(il_dir, "ckpt_2"),
        "--kp_index_mode", "selector", "--stage2_mask_policy", "selector",
        "--selector_ckpt", sel_ckpt,
        "--num_batches", "1", "--batch", "8", "--num_samples", "64",
        "--maze_h", "9", "--maze_w", "9", "--bf16", "0",
        "--out_dir", str(tmp_path / "gen"),
    ])
    assert "refined_collision_rate" in summary


def test_stage2_mask_policy_mix_dp_and_validation(prep_npz, tmp_path):
    """mask_policy_mix: the dp bucket pulls idx_base from the dataset's
    kp_idx, selector entries demand a ckpt, unknown names fail."""
    import pytest

    from interpolated_diffusion_tpu.train.train_interp_levels import main

    common = ["--dataset", "prepared", "--prepared_path", prep_npz, "--T", "32",
              "--maze_h", "9", "--maze_w", "9", "--batch", "16",
              "--d_model", "32", "--n_layers", "1", "--n_heads", "2",
              "--d_ff", "64", "--maze_channels", "8", "--bf16", "0",
              "--steps_per_call", "1", "--log_every", "1",
              "--K_min", "4", "--levels", "2", "--mode", "adj"]
    out = str(tmp_path / "il_dpmix")
    main(common + ["--mask_policy_mix", "dp:0.7,uniform:0.3",
                   "--steps", "2", "--save_every", "2", "--out_dir", out])
    import os

    assert os.path.exists(os.path.join(out, "ckpt_2"))

    with pytest.raises(ValueError, match="selector"):
        main(common + ["--mask_policy_mix", "selector:1.0",
                       "--steps", "1", "--save_every", "1",
                       "--out_dir", str(tmp_path / "x1")])
    with pytest.raises(ValueError, match="unknown"):
        main(common + ["--mask_policy_mix", "bogus:1.0",
                       "--steps", "1", "--save_every", "1",
                       "--out_dir", str(tmp_path / "x2")])
