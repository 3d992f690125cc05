"""Video stack tests: tokens, frame features, corruption builders, denoisers,
toy-video trainers + sampler e2e (tiny, CPU)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpolated_diffusion_tpu.ops.video_keyframes import (
    build_video_interp_adjacent_batch,
    build_video_interp_level_batch,
    build_video_token_interp_level_batch,
    interpolate_video_from_indices,
    smooth_latents,
)
from interpolated_diffusion_tpu.utils.frame_features import frame_features_from_mask
from interpolated_diffusion_tpu.utils.video_tokens import patchify_latents, unpatchify_tokens

pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)


def test_patchify_roundtrip():
    lat = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 8, 12))
    tokens, shape = patchify_latents(lat, 4)
    assert tokens.shape == (2, 4, 2 * 3, 16 * 16)
    rec = unpatchify_tokens(tokens, 4, shape)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(lat))


def test_frame_features_values():
    mask = jnp.zeros((1, 9), dtype=bool).at[0, 0].set(True).at[0, 8].set(True)
    f = np.asarray(frame_features_from_mask(mask))
    assert f.shape == (1, 9, 5)
    np.testing.assert_allclose(f[0, :, 0], np.arange(9) / 8)      # t_norm
    np.testing.assert_allclose(f[0, [0, 8], 1], 1.0)              # is_anchor
    np.testing.assert_allclose(f[0, 4, 2], 0.5)                   # alpha at midpoint
    np.testing.assert_allclose(f[0, 1:-1, 3], 1.0)                # gap_norm (interior)
    np.testing.assert_allclose(f[0, 4, 4], 1.0)                   # dist_mid at center
    np.testing.assert_allclose(f[0, [0, 8], 4], 0.0)


def test_frame_features_no_anchor_fallback():
    mask = jnp.zeros((1, 8), dtype=bool)
    f = np.asarray(frame_features_from_mask(mask))
    np.testing.assert_allclose(f[0, [0, 7], 1], 1.0)  # endpoint fallback anchors


def test_smooth_interp_preserves_anchors():
    B, T, D = 2, 12, 6
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    idx = jnp.array([[0, 4, 11], [0, 7, 11]], dtype=jnp.int32)
    vals = jnp.take_along_axis(x0, idx[..., None], axis=1)
    z = interpolate_video_from_indices(idx, vals, T, mode="smooth")
    got = jnp.take_along_axis(z, idx[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(vals), atol=1e-6)
    # note: smoothing an exact piecewise-linear sequence is (correctly) an
    # identity away from anchors; verify the kernel itself acts on curvature
    zz = jax.random.normal(jax.random.PRNGKey(9), (1, 8, 2))
    sm = smooth_latents(zz, jnp.array([0.25, 0.5, 0.25]))
    assert float(jnp.abs(sm - zz).max()) > 1e-3
    np.testing.assert_allclose(  # interior = exact 3-tap average
        np.asarray(sm[0, 3]),
        np.asarray(0.25 * zz[0, 2] + 0.5 * zz[0, 3] + 0.25 * zz[0, 4]),
        rtol=1e-5,
    )


def test_video_level_batch_conf_and_mask():
    B, T, D = 3, 16, 8
    z0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    z_s, mask_s, s_idx, masks_levels, idx_levels, conf_s = (
        build_video_interp_level_batch(
            jax.random.PRNGKey(2), z0, K_min=4, levels=2,
            corrupt_mode="none", student_replace_prob=0.0,
        )
    )
    m = np.asarray(mask_s)
    c = np.asarray(conf_s)
    # anchors carry conf_anchor, endpoints conf_endpoints, missing 0
    assert np.all(c[m & ~np.isin(np.arange(T), [0, T - 1])[None, :]] == 0.95)
    assert np.all(c[:, 0] == 1.0) and np.all(c[:, -1] == 1.0)
    assert np.all(c[~m] == 0.0)
    # with no corruption, z_s equals pure lerp of the sampled level
    from interpolated_diffusion_tpu.ops.keyframes import interpolate_from_mask
    for b in range(B):
        y = interpolate_from_mask(z0[b], mask_s[b])
        np.testing.assert_allclose(np.asarray(z_s[b]), np.asarray(y), atol=1e-5)


def test_video_adjacent_student_anchor_values_join():
    """Precomputed anchor values at anchor_idx replace GT anchors when drawn."""
    B, T, D = 2, 12, 4
    z0 = jnp.zeros((B, T, D))
    anchor_idx = jnp.broadcast_to(jnp.array([0, 5, 11], dtype=jnp.int32), (B, 3))
    anchor_values = jnp.full((B, 3, D), 7.0)
    z_s, *_ , conf_s = build_video_interp_level_batch(
        jax.random.PRNGKey(3), z0, K_min=3, levels=1,
        corrupt_mode="none", student_replace_prob=1.0, student_noise_std=0.0,
        anchor_values=anchor_values, anchor_idx=anchor_idx,
        clamp_endpoints=False,
    )
    # wherever idx matched anchor_idx positions, values became 7
    z = np.asarray(z_s)
    assert (z == 7.0).any()
    c = np.asarray(conf_s)
    assert (c == 0.5).any()  # student confidence at replaced anchors


def test_token_builders_shapes():
    B, T, N, D = 2, 8, 6, 4
    z0 = jax.random.normal(jax.random.PRNGKey(4), (B, T, N, D))
    z_s, mask_s, s_idx, _, _, conf_s = build_video_token_interp_level_batch(
        jax.random.PRNGKey(5), z0, K_min=3, levels=2, corrupt_mode="none",
        student_replace_prob=0.0,
    )
    assert z_s.shape == (B, T, N, D)
    assert mask_s.shape == (B, T, N)
    assert conf_s.shape == (B, T, N)


def test_video_token_denoisers_forward():
    from interpolated_diffusion_tpu.models.video_denoisers import (
        VideoTokenInterpLevelDenoiser,
        VideoTokenKeypointDenoiser,
    )

    B, K, T, N, D = 2, 3, 8, 6, 16
    kp = VideoTokenKeypointDenoiser(d_model=32, n_layers=2, n_heads=2, d_ff=64,
                                    data_dim=D)
    z = jax.random.normal(jax.random.PRNGKey(0), (B, K, N, D))
    idx = jnp.broadcast_to(jnp.array([0, 3, 7], dtype=jnp.int32), (B, K))
    cond = {"text_embed": jax.random.normal(jax.random.PRNGKey(1), (B, 5, 12))}
    params = kp.init(jax.random.PRNGKey(2), z, jnp.zeros((B,), jnp.int32), idx,
                     cond, T, (2, 3))
    out = kp.apply(params, z, jnp.zeros((B,), jnp.int32), idx, cond, T, (2, 3))
    assert out.shape == (B, K, N, D)

    il = VideoTokenInterpLevelDenoiser(d_model=32, n_layers=2, n_heads=2, d_ff=64,
                                       data_dim=D, mask_channels=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, N, D))
    mask = jnp.zeros((B, T, N, 2))
    params = il.init(jax.random.PRNGKey(4), x, jnp.ones((B,), jnp.int32), mask,
                     cond, (2, 3))
    out = il.apply(params, x, jnp.ones((B,), jnp.int32), mask, cond, (2, 3))
    assert out.shape == (B, T, N, D)


def test_toy_video_e2e(tmp_path):
    from interpolated_diffusion_tpu.train.train_keypoints_toy_video import main as kp_main
    from interpolated_diffusion_tpu.train.train_interp_levels_toy_video import main as il_main
    from interpolated_diffusion_tpu.sample.sample_toy_video import main as sample_main

    tiny = ["--T", "8", "--latent_size", "8", "--num_samples", "32",
            "--batch", "8", "--d_model", "32", "--n_layers", "2",
            "--n_heads", "2", "--d_ff", "64", "--bf16", "0",
            "--steps", "2", "--save_every", "2", "--log_every", "1"]
    kp_dir = str(tmp_path / "kp")
    kp_main(tiny + ["--K", "3", "--out_dir", kp_dir])
    il_dir = str(tmp_path / "il")
    il_main(tiny + ["--K_min", "3", "--levels", "2", "--mode", "adj",
                    "--interp_mode", "smooth", "--out_dir", il_dir])
    summary = sample_main([
        "--kp_ckpt", os.path.join(kp_dir, "ckpt_2"),
        "--interp_ckpt", os.path.join(il_dir, "ckpt_2"),
        "--num_batches", "2", "--batch", "4", "--ddim_steps", "4",
        "--num_samples", "16", "--bf16", "0",
        "--out_dir", str(tmp_path / "gen"),
    ])
    # oracle anchors (GT frames) must beat predicted anchors on interp MSE
    assert summary["oracle_interp_mse_to_gt"] <= summary["interp_mse_to_gt"] + 1e-6
    assert os.path.exists(str(tmp_path / "gen" / "samples.npz"))
