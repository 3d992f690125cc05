"""Stage-1 kp_feat must be rebuilt at sampling/bootstrap time.

Regression for the round-2 D4RL divergence: KeypointDenoiser silently
substitutes zeros when cond lacks "kp_feat" (models/denoisers.py), so a model
trained with use_kp_feat=1 was sampled off-distribution by generate.py and by
the Stage-2 bootstrap sampler — DDIM amplified the wrong eps into divergent
anchors (Stage-2 loss ~1e6). The samplers now rebuild the idx-geometry
features from `idx` exactly as the trainer does (ops/selection.py
build_kp_feat_batch).
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from interpolated_diffusion_tpu.models.denoisers import KeypointDenoiser
from interpolated_diffusion_tpu.ops.schedules import make_schedule
from interpolated_diffusion_tpu.sample.generate import PipelineConfig, make_pipeline
from interpolated_diffusion_tpu.models.denoisers import InterpLevelDenoiser

pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)

T, K, D, LEVELS = 32, 4, 2, 2
GRID = 8


def _models_and_params(kp_feat_dim):
    kp = KeypointDenoiser(d_model=32, n_layers=1, n_heads=2, d_ff=64,
                          d_cond=16, data_dim=D, kp_feat_dim=kp_feat_dim,
                          maze_channels=(4,))
    il = InterpLevelDenoiser(d_model=32, n_layers=1, n_heads=2, d_ff=64,
                             d_cond=16, data_dim=D, mask_channels=2,
                             maze_channels=(4,))
    cond = {"occ": jnp.zeros((1, 1, GRID, GRID)),
            "start_goal": jnp.zeros((1, 4))}
    kp_params = kp.init(jax.random.PRNGKey(0), jnp.zeros((1, K, D)),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, K), jnp.int32),
                        jnp.zeros((1, K, D), bool), cond, T)["params"]
    il_params = il.init(jax.random.PRNGKey(1), jnp.zeros((1, T, D)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, T, 2)),
                        cond)["params"]
    return kp, il, kp_params, il_params


def test_pipeline_feeds_kp_feat_to_stage1():
    kp, il, kp_params, il_params = _models_and_params(kp_feat_dim=3)
    schedule = make_schedule("linear", 10)
    B = 2
    idx = jnp.broadcast_to(jnp.array([0, 9, 21, T - 1], jnp.int32), (B, K))
    cond = {"occ": jnp.zeros((B, 1, GRID, GRID)),
            "start_goal": jnp.full((B, 4), 0.5)}

    def run(feat_dim):
        cfg = PipelineConfig(T=T, K=K, levels=LEVELS, K_min=K, ddim_steps=4,
                             kp_feat_dim=feat_dim)
        pipe = make_pipeline(kp, il, schedule, cfg, D)
        return pipe(kp_params, il_params, jax.random.PRNGKey(3), idx, cond)[2]

    z_with = run(3)
    z_zero = run(0)
    # with nonzero-initialized feature weights, real idx-geometry features
    # must change the stage-1 output vs the silent zero fallback
    assert not np.allclose(np.asarray(z_with), np.asarray(z_zero), atol=1e-6)


def test_pipeline_kp_feat_matches_trainer_features():
    """The features the pipeline feeds equal the trainer's build_kp_feat_batch
    (padded to kp_feat_dim) — checked through the model by comparing against
    a manual cond that carries the trainer-built features."""
    from interpolated_diffusion_tpu.ops.selection import build_kp_feat_batch

    kp, il, kp_params, il_params = _models_and_params(kp_feat_dim=4)
    schedule = make_schedule("linear", 10)
    B = 2
    idx = jnp.broadcast_to(jnp.array([0, 5, 17, T - 1], jnp.int32), (B, K))
    cond = {"occ": jnp.zeros((B, 1, GRID, GRID)),
            "start_goal": jnp.full((B, 4), 0.5)}
    cfg = PipelineConfig(T=T, K=K, levels=LEVELS, K_min=K, ddim_steps=4,
                         kp_feat_dim=4)
    pipe = make_pipeline(kp, il, schedule, cfg, D)
    z_auto = pipe(kp_params, il_params, jax.random.PRNGKey(3), idx, cond)[2]

    feat = build_kp_feat_batch(idx, T)
    feat = jnp.pad(feat, ((0, 0), (0, 0), (0, 1)))
    cond_manual = dict(cond)
    cond_manual["kp_feat"] = feat
    # kp_feat_dim=0 config → pipeline passes cond through untouched, so the
    # manual features are what the model sees
    cfg0 = PipelineConfig(T=T, K=K, levels=LEVELS, K_min=K, ddim_steps=4,
                          kp_feat_dim=0)
    pipe0 = make_pipeline(kp, il, schedule, cfg0, D)
    z_manual = pipe0(kp_params, il_params, jax.random.PRNGKey(3), idx,
                     cond_manual)[2]
    np.testing.assert_allclose(np.asarray(z_auto), np.asarray(z_manual),
                               atol=1e-6)


def test_build_kp_feat_full_cost_channels():
    """Reference _kp_feat_from_idx layout: ch3 = left-segment cost (0 at the
    first kp), ch4 = right-segment cost (0 at the last kp)."""
    from interpolated_diffusion_tpu.ops.selection import (
        build_kp_feat_batch,
        build_kp_feat_full,
    )

    idx = jnp.array([[0, 5, 17, 31]], jnp.int32)
    seg_cost = jnp.array([[0.1, 0.2, 0.3]])
    feat = build_kp_feat_full(idx, 32, 5, seg_cost)
    assert feat.shape == (1, 4, 5)
    np.testing.assert_allclose(np.asarray(feat[:, :, :3]),
                               np.asarray(build_kp_feat_batch(idx, 32)))
    np.testing.assert_allclose(np.asarray(feat[0, :, 3]), [0.0, 0.1, 0.2, 0.3])
    np.testing.assert_allclose(np.asarray(feat[0, :, 4]), [0.1, 0.2, 0.3, 0.0])
    # without seg_cost the cost channels stay zero (dphi_model=None parity)
    feat0 = build_kp_feat_full(idx, 32, 5, None)
    np.testing.assert_allclose(np.asarray(feat0[:, :, 3:]), 0.0)
    # kp_feat_dim < 5 ignores seg_cost entirely
    feat3 = build_kp_feat_full(idx, 32, 3, seg_cost)
    assert feat3.shape == (1, 4, 3)


def test_pipeline_dphi_fn_feeds_cost_channels():
    """make_pipeline(dphi_fn=...) must produce the same Stage-1 output as a
    manual cond carrying trainer-built 5-dim features."""
    from interpolated_diffusion_tpu.ops.selection import build_kp_feat_full

    kp, il, kp_params, il_params = _models_and_params(kp_feat_dim=5)
    schedule = make_schedule("linear", 10)
    B = 2
    idx = jnp.broadcast_to(jnp.array([0, 5, 17, T - 1], jnp.int32), (B, K))
    cond = {"occ": jnp.zeros((B, 1, GRID, GRID)),
            "start_goal": jnp.full((B, 4), 0.5)}

    def fake_dphi(c, i):
        return (i[:, 1:] - i[:, :-1]).astype(jnp.float32) * 0.01

    cfg = PipelineConfig(T=T, K=K, levels=LEVELS, K_min=K, ddim_steps=4,
                         kp_feat_dim=5)
    pipe = make_pipeline(kp, il, schedule, cfg, D, dphi_fn=fake_dphi)
    z_auto = pipe(kp_params, il_params, jax.random.PRNGKey(3), idx, cond)[2]

    cond_manual = dict(cond)
    cond_manual["kp_feat"] = build_kp_feat_full(idx, T, 5, fake_dphi(cond, idx))
    cfg0 = PipelineConfig(T=T, K=K, levels=LEVELS, K_min=K, ddim_steps=4,
                          kp_feat_dim=0)
    pipe0 = make_pipeline(kp, il, schedule, cfg0, D)
    z_manual = pipe0(kp_params, il_params, jax.random.PRNGKey(3), idx,
                     cond_manual)[2]
    np.testing.assert_allclose(np.asarray(z_auto), np.asarray(z_manual),
                               atol=1e-6)
    # and the cost channels must actually matter (nonzero effect vs zeros)
    pipe_z = make_pipeline(kp, il, schedule, cfg, D)  # no dphi -> zeros
    z_zero = pipe_z(kp_params, il_params, jax.random.PRNGKey(3), idx, cond)[2]
    assert not np.allclose(np.asarray(z_auto), np.asarray(z_zero), atol=1e-6)


def test_stage1_fora_cache_identity_and_divergence():
    """KeypointDenoiser FORA plumbing: cached call with the delta from a full
    call at the same inputs reproduces it exactly; the cached pipeline at
    interval >= ddim_steps differs from the exact pipeline (approximation,
    not a no-op) while preserving endpoint clamping."""
    kp, il, kp_params, il_params = _models_and_params(kp_feat_dim=0)
    B = 2
    z = jax.random.normal(jax.random.PRNGKey(0), (B, K, D))
    t = jnp.array([3, 7], jnp.int32)
    idx = jnp.broadcast_to(jnp.array([0, 9, 21, T - 1], jnp.int32), (B, K))
    known = jnp.zeros((B, K, D), bool)
    cond = {"occ": jnp.zeros((B, 1, GRID, GRID)),
            "start_goal": jnp.full((B, 4), 0.5)}
    out_full, delta = kp.apply({"params": kp_params}, z, t, idx, known, cond,
                               T, return_delta=True)
    out_cached = kp.apply({"params": kp_params}, z, t, idx, known, cond, T,
                          blocks_delta=delta)
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_full),
                               atol=1e-6)

    schedule = make_schedule("linear", 10)
    outs = {}
    for interval in (1, 4):
        cfg = PipelineConfig(T=T, K=K, levels=LEVELS, K_min=K, ddim_steps=8,
                             stage1_cache_interval=interval)
        pipe = make_pipeline(kp, il, schedule, cfg, D)
        outs[interval] = pipe(kp_params, il_params, jax.random.PRNGKey(3),
                              idx, cond)[2]
    z1, z4 = np.asarray(outs[1]), np.asarray(outs[4])
    assert np.isfinite(z4).all()
    assert not np.allclose(z1, z4, atol=1e-6)
    # endpoint clamping survives the cached path
    np.testing.assert_allclose(z4[:, 0, :2], 0.5, atol=1e-5)
    np.testing.assert_allclose(z4[:, -1, :2], 0.5, atol=1e-5)


def test_stage1_best_of_reduces_collision():
    """Best-of-N anchor search: the collision-argmin over N candidates must
    not exceed the single-sample pipeline's collision (deterministic seeds)."""
    from interpolated_diffusion_tpu.eval.metrics import compute_metrics_batch

    kp, il, kp_params, il_params = _models_and_params(kp_feat_dim=0)
    schedule = make_schedule("linear", 10)
    B = 16
    key = jax.random.PRNGKey(0)
    occ = (jax.random.uniform(key, (B, 1, GRID, GRID)) < 0.3).astype(jnp.float32)
    occ = occ.at[:, :, 0, 0].set(0.0).at[:, :, -1, -1].set(0.0)
    cond = {"occ": occ,
            "start_goal": jnp.concatenate(
                [jnp.full((B, 2), 0.05), jnp.full((B, 2), 0.95)], axis=1)}
    idx = jnp.broadcast_to(jnp.array([0, 9, 21, T - 1], jnp.int32), (B, K))

    colls = {}
    for n in (1, 4):
        cfg = PipelineConfig(T=T, K=K, levels=LEVELS, K_min=K, ddim_steps=4,
                             stage1_best_of=n)
        pipe = make_pipeline(kp, il, schedule, cfg, D)
        x_interp = pipe(kp_params, il_params, jax.random.PRNGKey(3), idx,
                        cond)[0]
        m = compute_metrics_batch(occ, x_interp, cond["start_goal"][:, 2:])
        colls[n] = float(m["collision_rate"].mean())
    assert colls[4] <= colls[1] + 1e-6, colls


def test_stage1_best_of_dp_dominates_set():
    """The DP mixer's search space contains every whole-set assignment, and
    its cost (anchor nodes + strict-interior edges) totals exactly the
    lerp's per-frame hit count — so on the same candidates dp collision <=
    set collision <= single-sample collision."""
    from interpolated_diffusion_tpu.eval.metrics import compute_metrics_batch

    kp, il, kp_params, il_params = _models_and_params(kp_feat_dim=0)
    schedule = make_schedule("linear", 10)
    B = 16
    key = jax.random.PRNGKey(0)
    occ = (jax.random.uniform(key, (B, 1, GRID, GRID)) < 0.3).astype(jnp.float32)
    occ = occ.at[:, :, 0, 0].set(0.0).at[:, :, -1, -1].set(0.0)
    cond = {"occ": occ,
            "start_goal": jnp.concatenate(
                [jnp.full((B, 2), 0.05), jnp.full((B, 2), 0.95)], axis=1)}
    idx = jnp.broadcast_to(jnp.array([0, 9, 21, T - 1], jnp.int32), (B, K))

    colls = {}
    for mode, n in (("set", 1), ("set", 4), ("dp", 4)):
        cfg = PipelineConfig(T=T, K=K, levels=LEVELS, K_min=K, ddim_steps=4,
                             stage1_best_of=n, stage1_best_of_mode=mode)
        pipe = make_pipeline(kp, il, schedule, cfg, D)
        x_interp = pipe(kp_params, il_params, jax.random.PRNGKey(3), idx,
                        cond)[0]
        m = compute_metrics_batch(occ, x_interp, cond["start_goal"][:, 2:])
        colls[(mode, n)] = float(m["collision_rate"].mean())
    assert colls[("set", 4)] <= colls[("set", 1)] + 1e-6, colls
    assert colls[("dp", 4)] <= colls[("set", 4)] + 1e-6, colls
