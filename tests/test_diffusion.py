"""Ports of reference tests/test_diffusion.py shape contracts, plus numerics
golden checks against hand-computed closed forms."""
import jax
import jax.numpy as jnp
import numpy as np

from interpolated_diffusion_tpu.ops.ddpm import (
    ddim_step,
    ddim_sample,
    ddpm_step,
    make_timesteps,
    predict_x0_from_eps,
    q_sample,
)
from interpolated_diffusion_tpu.ops.schedules import make_alpha_bars, make_beta_schedule


def _sched(n=10, name="linear"):
    return make_alpha_bars(make_beta_schedule(name, n))


def test_q_sample_shapes():
    B, T, D = 2, 8, 2
    schedule = _sched()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, T, D))
    t = jnp.array([3, 7])
    xt, eps = q_sample(x0, t, schedule, key=jax.random.PRNGKey(1))
    assert xt.shape == x0.shape
    assert eps.shape == x0.shape


def test_q_sample_closed_form():
    schedule = _sched()
    x0 = jnp.ones((1, 4, 2))
    noise = jnp.full((1, 4, 2), 0.5)
    t = jnp.array([5])
    xt, _ = q_sample(x0, t, schedule, noise=noise)
    expected = schedule.sqrt_alpha_bar[5] * 1.0 + schedule.sqrt_one_minus_alpha_bar[5] * 0.5
    np.testing.assert_allclose(np.asarray(xt), float(expected), rtol=1e-6)


def test_ddim_step_shapes():
    B, T, D = 2, 8, 2
    schedule = _sched()
    xt = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    eps = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    t = jnp.full((B,), 5)
    t_prev = jnp.full((B,), 4)
    out = ddim_step(xt, eps, t, t_prev, schedule)
    assert out.shape == xt.shape


def test_ddim_step_deterministic_formula():
    schedule = _sched()
    xt = jnp.ones((1, 2, 2)) * 0.7
    eps = jnp.ones((1, 2, 2)) * 0.2
    t = jnp.array([5])
    tp = jnp.array([3])
    out = ddim_step(xt, eps, t, tp, schedule)
    ab_t = schedule.alpha_bar[5]
    ab_p = schedule.alpha_bar[3]
    x0 = (0.7 - jnp.sqrt(1 - ab_t) * 0.2) / jnp.sqrt(ab_t)
    expected = jnp.sqrt(ab_p) * x0 + jnp.sqrt(1 - ab_p) * 0.2
    np.testing.assert_allclose(np.asarray(out), float(expected), rtol=1e-6)


def test_predict_x0_roundtrip():
    schedule = _sched(100)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 2))
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 2))
    t = jnp.array([10, 50])
    xt, _ = q_sample(x0, t, schedule, noise=noise)
    rec = predict_x0_from_eps(xt, noise, t, schedule)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)


def test_ddpm_step_zero_noise_at_t0():
    schedule = _sched()
    xt = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 2))
    t0 = jnp.zeros((2,), dtype=jnp.int32)
    out_a = ddpm_step(xt, eps, t0, schedule, key=jax.random.PRNGKey(2))
    out_b = ddpm_step(xt, eps, t0, schedule, key=None)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6)


def test_make_timesteps_endpoints_and_order():
    for spacing in ("linear", "quadratic", "sqrt"):
        ts = make_timesteps(100, 20, spacing)
        assert ts[0] == 99
        assert ts[-1] == 0
        assert np.all(np.diff(ts) < 0)
    assert list(make_timesteps(100, 1)) == [99, 0]
    assert list(make_timesteps(5, 10)) == [4, 3, 2, 1, 0]


def test_ddim_sample_scan_runs_and_respects_keep_mask():
    schedule = _sched(50)
    B, T, D = 2, 8, 2
    keep = jnp.zeros((B, T), dtype=bool).at[:, 0].set(True)

    def model_fn(x, t):
        return x * 0.1

    out = jax.jit(
        lambda k: ddim_sample(model_fn, schedule, k, (B, T, D), steps=5, keep_mask=keep)
    )(jax.random.PRNGKey(0))
    assert out.shape == (B, T, D)
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0)
