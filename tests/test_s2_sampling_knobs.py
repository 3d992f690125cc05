"""Round-5 Stage-2 sampling knobs: delta smoothing + anchor-conf override.

- s2_delta_smooth: N passes of a 3-tap binomial at missing frames must
  preserve endpoint/anchor values exactly (interpolation invariant) and
  reduce the accel (smoothness) of the refined output.
- anchor_conf_teacher override: the conf channel presented to the Stage-2
  model is a real input — overriding it must change the refined output
  (wiring test for --anchor_conf_override, the train/test conf-mismatch
  fix; reference conf semantics train_interp_levels.py:546-576).
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from interpolated_diffusion_tpu.models.denoisers import (
    InterpLevelDenoiser, KeypointDenoiser,
)
from interpolated_diffusion_tpu.ops.schedules import make_schedule
from interpolated_diffusion_tpu.sample.generate import PipelineConfig, make_pipeline

pytestmark = pytest.mark.slow  # heavy e2e tier (fast tier must stay <8 min)

T, K, D, LEVELS = 32, 4, 2, 2
GRID = 8


def _models_and_params(mask_channels):
    kp = KeypointDenoiser(d_model=32, n_layers=1, n_heads=2, d_ff=64,
                          d_cond=16, data_dim=D, maze_channels=(4,))
    il = InterpLevelDenoiser(d_model=32, n_layers=1, n_heads=2, d_ff=64,
                             d_cond=16, data_dim=D,
                             mask_channels=mask_channels, maze_channels=(4,))
    cond = {"occ": jnp.zeros((1, 1, GRID, GRID)),
            "start_goal": jnp.zeros((1, 4))}
    kp_params = kp.init(jax.random.PRNGKey(0), jnp.zeros((1, K, D)),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, K), jnp.int32),
                        jnp.zeros((1, K, D), bool), cond, T)["params"]
    il_params = il.init(jax.random.PRNGKey(1), jnp.zeros((1, T, D)),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, T, mask_channels)),
                        cond)["params"]
    # the delta head is zero-initialized (delta ≡ 0 at init → refined ==
    # interp and no input sensitivity); nudge every weight so the model is
    # a non-trivial function of its inputs
    il_params = jax.tree_util.tree_map(lambda p: p + 0.01, il_params)
    return kp, il, kp_params, il_params


def _accel(x):
    return float(jnp.abs(x[:, 2:] - 2 * x[:, 1:-1] + x[:, :-2]).mean())


def _run(cfg_kwargs, mask_channels=2):
    kp, il, kp_params, il_params = _models_and_params(mask_channels)
    schedule = make_schedule("linear", 10)
    B = 2
    idx = jnp.broadcast_to(jnp.array([0, 9, 21, T - 1], jnp.int32), (B, K))
    cond = {"occ": jnp.zeros((B, 1, GRID, GRID)),
            "start_goal": jnp.full((B, 4), 0.5)}
    cfg = PipelineConfig(T=T, K=K, levels=LEVELS, K_min=K, ddim_steps=4,
                         **cfg_kwargs)
    pipe = make_pipeline(kp, il, schedule, cfg, D)
    out = pipe(kp_params, il_params, jax.random.PRNGKey(3), idx, cond)
    return out  # (x_interp, x_refined, z_pred) — see make_pipeline


def test_delta_smooth_preserves_anchors_and_reduces_accel():
    rough = _run(dict(clamp_policy="all_anchors", s2_delta_smooth=0))
    smooth = _run(dict(clamp_policy="all_anchors", s2_delta_smooth=2))
    x_r, x_s = np.asarray(rough[1]), np.asarray(smooth[1])
    interp_r = np.asarray(rough[0])
    idx = np.array([0, 9, 21, T - 1])
    # anchors (clamped to x_pred) identical in both arms
    np.testing.assert_allclose(x_s[:, idx], interp_r[:, idx], atol=1e-5)
    assert np.isfinite(x_s).all()
    assert _accel(jnp.asarray(x_s)) <= _accel(jnp.asarray(x_r)) + 1e-9


def test_anchor_conf_override_changes_output():
    base = _run(dict(anchor_conf=True, anchor_conf_teacher=0.95),
                mask_channels=3)
    low = _run(dict(anchor_conf=True, anchor_conf_teacher=0.5),
               mask_channels=3)
    assert not np.allclose(np.asarray(base[1]), np.asarray(low[1]))
