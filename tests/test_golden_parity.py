"""Golden parity vs the PyTorch reference implementation.

tests/golden/reference_golden.npz holds outputs produced by RUNNING the
reference (scripts/make_golden_reference.py) on fixed inputs. These tests
feed the same inputs through the JAX ops and require agreement within f32
tolerance — the cross-implementation acceptance gate from SURVEY.md §4.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from interpolated_diffusion_tpu.ops import ddpm
from interpolated_diffusion_tpu.ops.schedules import make_alpha_bars, make_beta_schedule
from interpolated_diffusion_tpu.ops.keyframes import (
    compute_k_schedule,
    interpolate_from_indices,
    interpolate_from_mask,
)
from interpolated_diffusion_tpu.ops.video_keyframes import (
    distance_alpha,
    interpolate_video_from_indices,
    smooth_latents,
)
from interpolated_diffusion_tpu.ops import selection as sel
from interpolated_diffusion_tpu.ops.oracle_segment_cost import (
    build_oracle_seg_precompute,
    compute_oracle_cost_seg_mse,
)
from interpolated_diffusion_tpu.ops.clamp import apply_clamp, apply_soft_clamp
from interpolated_diffusion_tpu.ops.normalize import logit_pos, sigmoid_pos
from interpolated_diffusion_tpu.utils.frame_features import frame_features_from_mask
from interpolated_diffusion_tpu.utils.video_tokens import patchify_latents, unpatchify_tokens
from interpolated_diffusion_tpu.eval.metrics import compute_metrics_batch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "reference_golden.npz")


@pytest.fixture(scope="module")
def g():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing (run scripts/make_golden_reference.py)")
    return np.load(GOLDEN)


def close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a, np.float64), np.asarray(b, np.float64),
                               atol=atol, rtol=rtol)


N_TRAIN = 100


def _sched():
    return make_alpha_bars(make_beta_schedule("linear", N_TRAIN))


def test_schedule_tables(g):
    for name in ("linear", "cosine"):
        ours = make_alpha_bars(make_beta_schedule(name, N_TRAIN))
        for field in ("betas", "alphas", "alpha_bar", "sqrt_alpha_bar",
                      "sqrt_one_minus_alpha_bar"):
            close(getattr(ours, field), g[f"sched/{name}/{field}"], atol=2e-6)


def test_q_sample_and_inversion(g):
    s = _sched()
    x0, noise, t = g["ddpm/x0"], g["ddpm/noise"], g["ddpm/t"]
    xt, _ = ddpm.q_sample(jnp.asarray(x0), jnp.asarray(t), s, noise=jnp.asarray(noise))
    close(xt, g["ddpm/q_sample"], atol=1e-5)
    x0_hat = ddpm.predict_x0_from_eps(xt, jnp.asarray(g["ddpm/eps_hat"]),
                                      jnp.asarray(t), s)
    close(x0_hat, g["ddpm/x0_from_eps"], atol=1e-4)
    # per-token timesteps (keyframe-masked noising)
    xt_tok, _ = ddpm.q_sample(jnp.asarray(x0), jnp.asarray(g["ddpm/t_tok"]), s,
                              noise=jnp.asarray(noise))
    close(xt_tok, g["ddpm/q_sample_tok"], atol=1e-5)


def test_ddim_step(g):
    s = _sched()
    xt = jnp.asarray(g["ddpm/q_sample"])
    out = ddpm.ddim_step(xt, jnp.asarray(g["ddpm/eps_hat"]), jnp.asarray(g["ddpm/t"]),
                         jnp.asarray(g["ddpm/t_prev"]), s, eta=0.0)
    close(out, g["ddpm/ddim_step"], atol=1e-4)


def test_timestep_subsequencing(g):
    for sch in ("linear", "quadratic", "sqrt"):
        for steps in (5, 20, 99, 150):
            ours = ddpm.make_timesteps(N_TRAIN, steps, schedule=sch)
            ref = g[f"ddpm/timesteps/{sch}/{steps}"]
            np.testing.assert_array_equal(np.asarray(ours, np.int64), ref)


def test_interpolate_from_indices(g):
    idx, vals = jnp.asarray(g["interp/idx"]), jnp.asarray(g["interp/vals4"])
    close(interpolate_from_indices(idx, vals, 32), g["interp/out"], atol=1e-6)
    close(interpolate_from_indices(idx, vals, 32, recompute_velocity=True),
          g["interp/out_vel"], atol=1e-4)


def test_interpolate_from_mask(g):
    out = interpolate_from_mask(jnp.asarray(g["interp/x_full"]),
                                jnp.asarray(g["interp/mask_in"]))
    close(out, g["interp/from_mask"], atol=1e-6)


def test_k_schedule(g):
    for sch in ("doubling", "linear", "geom"):
        kw = {"geom_gamma": 1.7} if sch == "geom" else {}
        ours = compute_k_schedule(64, 8, 3, schedule=sch, **kw)
        np.testing.assert_array_equal(np.asarray(ours, np.int64),
                                      g[f"interp/k_schedule/{sch}"])


def test_video_interp_helpers(g):
    idx = jnp.asarray(g["interp/idx"])
    close(distance_alpha(idx, 32), g["video/distance_alpha"], atol=1e-6)
    kernel = jnp.asarray(g["video/smooth_kernel"])
    close(smooth_latents(jnp.asarray(g["video/z_flat"]), kernel),
          g["video/smooth"], atol=1e-5)
    vals6 = jnp.asarray(g["video/vals6"])
    close(interpolate_video_from_indices(idx, vals6, 32, mode="linear"),
          g["video/interp_linear"], atol=1e-6)
    close(interpolate_video_from_indices(idx, vals6, 32, mode="smooth",
                                         smooth_kernel=kernel),
          g["video/interp_smooth"], atol=1e-5)


def test_snr_weights_and_log_snr_steps(g):
    snr, w = sel.build_snr_weights("linear", N_TRAIN, 0.05, 20.0, 0.5)
    close(snr, g["sel/snr"], rtol=1e-4)
    close(w, g["sel/snr_weights"], rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(sel.sample_timesteps_log_snr(snr, 12), np.int64),
        g["sel/log_snr_steps"])


def test_segment_precompute_and_costs(g):
    pre = sel.build_segment_precompute(24, 4)
    np.testing.assert_array_equal(np.asarray(pre.seg_i, np.int64), g["sel/seg_i"])
    np.testing.assert_array_equal(np.asarray(pre.seg_j, np.int64), g["sel/seg_j"])
    np.testing.assert_array_equal(np.asarray(pre.t_idx, np.int64), g["sel/t_idx"])
    close(pre.alpha, g["sel/alpha"], atol=1e-6)
    close(pre.weight, g["sel/weight"], atol=1e-6)
    close(sel.build_segment_features(24, pre.seg_i, pre.seg_j), g["sel/seg_feat"],
          atol=1e-6)
    close(sel.build_segment_features_from_idx(jnp.asarray(g["interp/idx"]), 32,
                                              seg_feat_dim=5),
          g["sel/seg_feat_idx"], atol=1e-6)
    cost = sel.compute_segment_costs_batch(jnp.asarray(g["sel/x_pos"]), pre, 1.0)
    close(cost, g["sel/cost_seg"], atol=1e-5, rtol=1e-4)


def test_dp_select_indices(g):
    pre = sel.build_segment_precompute(24, 4)
    cost = sel.compute_segment_costs_batch(jnp.asarray(g["sel/x_pos"]), pre, 1.0)
    C = sel.build_cost_matrix_from_segments(cost, pre, 24)
    idx = sel.dp_select_indices_batch(C, 6)
    np.testing.assert_array_equal(np.asarray(idx, np.int64), g["sel/dp_idx"])


def test_kp_feat(g):
    close(sel.build_kp_feat_batch(jnp.asarray(g["interp/idx"]), 32),
          g["sel/kp_feat"], atol=1e-6)


def test_oracle_segment_cost(g):
    z = g["oracle/z_vid"]  # [B,T,C,H,W]
    B, T = z.shape[:2]
    pre = build_oracle_seg_precompute(T)
    z_flat = jnp.asarray(z.reshape(B, T, -1))
    # reference divides per-frame MSE by C*H*W and sums over interior frames
    cost = compute_oracle_cost_seg_mse(z_flat, pre, normalize=False)
    close(cost, g["oracle/cost"], atol=1e-4, rtol=1e-4)


def test_clamps(g):
    x_hat, x_ref = jnp.asarray(g["clamp/x_hat"]), jnp.asarray(g["clamp/x_ref"])
    mask = jnp.asarray(g["clamp/mask"])
    close(apply_clamp(x_hat, x_ref, mask, "pos"), g["clamp/hard_pos"], atol=1e-7)
    close(apply_clamp(x_hat, x_ref, mask, "all"), g["clamp/hard_all"], atol=1e-7)
    close(apply_soft_clamp(x_hat, x_ref, jnp.asarray(g["clamp/conf"]), 0.35, "pos"),
          g["clamp/soft"], atol=1e-6)


def test_normalize(g):
    x = jnp.asarray(g["norm/x"])
    close(logit_pos(x), g["norm/logit"], atol=1e-4)
    close(sigmoid_pos(logit_pos(x)), g["norm/sigmoid"], atol=1e-5)


def test_frame_features(g):
    mask = jnp.asarray(g["ff/mask"])
    close(frame_features_from_mask(mask, include_time=True), g["ff/with_time"],
          atol=1e-5)
    close(frame_features_from_mask(mask, include_time=False), g["ff/no_time"],
          atol=1e-5)


def test_video_tokens_roundtrip(g):
    lat = jnp.asarray(g["tok/latents"])
    tokens, (hp, wp) = patchify_latents(lat, 2)
    close(tokens, g["tok/tokens"], atol=1e-7)
    np.testing.assert_array_equal([hp, wp], g["tok/spatial"])
    close(unpatchify_tokens(tokens, 2, (hp, wp)), g["tok/roundtrip"], atol=1e-7)


def test_metrics(g):
    m = compute_metrics_batch(jnp.asarray(g["metrics/occ"]),
                              jnp.asarray(g["metrics/traj"]),
                              jnp.asarray(g["metrics/goal"]),
                              gt=jnp.asarray(g["metrics/gt"]))
    for k in ("collision_rate", "goal_dist", "success", "path_length",
              "smoothness", "mse_to_gt"):
        close(m[k], g[f"metrics/{k}"], atol=1e-5, rtol=1e-4)


def test_grid_sample_parity(g):
    from interpolated_diffusion_tpu.ops.image import grid_sample_bilinear

    out = grid_sample_bilinear(jnp.asarray(g["img/x"]), jnp.asarray(g["img/grid"]))
    close(out, g["img/grid_sample_border"], atol=1e-5)


def test_resize_and_pool_parity(g):
    from interpolated_diffusion_tpu.ops.image import avg_pool2d, resize_bilinear

    close(resize_bilinear(jnp.asarray(g["img/x"]), (16, 20)), g["img/resize_up"],
          atol=1e-5)
    close(avg_pool2d(jnp.asarray(g["img/x"]), 2), g["img/avg_pool2"], atol=1e-6)


def test_sinkhorn_log_parity(g):
    from interpolated_diffusion_tpu.models.sinkhorn_warp import sinkhorn_log

    out = sinkhorn_log(jnp.asarray(g["sk/logits"]), 12)
    close(out, g["sk/log_plan"], atol=1e-5)
