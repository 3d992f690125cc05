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


def test_pfdiff_exact_match_for_static_eps():
    """DDIM is transitive in its x0 parameterization, so with an eps that
    doesn't depend on (x, t) the PFDiff springboard/foresight scan must
    reproduce plain DDIM on the same grid exactly — even and odd interval
    counts both."""
    from interpolated_diffusion_tpu.ops.ddpm import ddim_scan, pfdiff_scan

    schedule = _sched(100)
    B, T, D = 2, 6, 2
    eps_const = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    z0 = jax.random.normal(jax.random.PRNGKey(2), (B, T, D))

    for steps in (6, 7):  # even + odd interval counts
        times = jnp.asarray(make_timesteps(100, steps))
        fn = lambda z, t: eps_const
        z_ddim, _ = jax.jit(lambda z: ddim_scan(fn, z, times, schedule))(z0)
        z_pf, _ = jax.jit(lambda z: pfdiff_scan(fn, z, times, schedule))(z0)
        np.testing.assert_allclose(np.asarray(z_pf), np.asarray(z_ddim),
                                   rtol=1e-5, atol=1e-6)


def test_pfdiff_nonlinear_close_to_ddim():
    """With a smooth state-dependent eps, PFDiff at the same grid should
    land near the full-NFE DDIM trajectory (it halves the model evals)."""
    from interpolated_diffusion_tpu.ops.ddpm import ddim_scan, pfdiff_scan

    schedule = _sched(100)
    B, T, D = 2, 6, 2
    w = jax.random.normal(jax.random.PRNGKey(3), (D, D)) * 0.3

    def fn(z, t):
        return jnp.tanh(z @ w) * 0.5

    z0 = jax.random.normal(jax.random.PRNGKey(4), (B, T, D))
    times = jnp.asarray(make_timesteps(100, 10))
    z_ddim, _ = jax.jit(lambda z: ddim_scan(fn, z, times, schedule))(z0)
    z_pf, _ = jax.jit(lambda z: pfdiff_scan(fn, z, times, schedule))(z0)
    assert np.isfinite(np.asarray(z_pf)).all()
    ref = np.abs(np.asarray(z_ddim)).mean() + 1e-6
    gap = np.abs(np.asarray(z_pf) - np.asarray(z_ddim)).mean() / ref
    assert gap < 0.15, f"pfdiff drifted {gap:.3f} from ddim"


def test_pfdiff_counts_model_evals():
    """NFE must be 1 + ceil((S-1)/2): the whole point of the method."""
    from interpolated_diffusion_tpu.ops.ddpm import pfdiff_scan

    schedule = _sched(100)
    B, T, D = 1, 4, 2
    z0 = jnp.zeros((B, T, D))

    for steps in (6, 7):
        times = jnp.asarray(make_timesteps(100, steps))
        n_int = int(times.shape[0]) - 1
        expect = 1 + -(-(n_int - 1) // 2)     # 1 + ceil((S-1)/2)
        calls = []

        def fn(z, t):
            calls.append(1)   # traced once per distinct eval site
            return z * 0.1

        pfdiff_scan(fn, z0, times, schedule)
        # scan traces its body once; count = warmup + scan-body + odd tail
        n_groups = (n_int - 1) // 2
        traced = 1 + (1 if n_groups else 0) + (1 if (n_int - 1) % 2 else 0)
        assert len(calls) == traced
        nfe = 1 + n_groups + ((n_int - 1) % 2)
        assert nfe == expect, (steps, n_int, nfe, expect)


def test_dpm_solver_pp_exact_for_static_x0():
    """First-order DPM++ transitions coincide with DDIM when the x0
    prediction is constant; the 2M correction term vanishes (m == m_prev),
    so the whole scan must reproduce DDIM on the same grid."""
    from interpolated_diffusion_tpu.ops.ddpm import (
        ddim_scan, dpm_solver_pp_scan,
    )

    schedule = _sched(100)
    B, T, D = 2, 6, 2
    x0_const = jax.random.normal(jax.random.PRNGKey(5), (B, T, D)) * 0.3
    z0 = jax.random.normal(jax.random.PRNGKey(6), (B, T, D))
    ab = schedule.alpha_bar

    def fn(z, t):
        a = jnp.sqrt(ab[t][0])
        s = jnp.sqrt(1.0 - ab[t][0])
        return (z - a * x0_const) / s          # eps consistent with fixed x0

    for steps in (5, 9):
        times = jnp.asarray(make_timesteps(100, steps))
        z_ddim, _ = jax.jit(lambda z: ddim_scan(fn, z, times, schedule))(z0)
        z_dpm, _ = jax.jit(
            lambda z: dpm_solver_pp_scan(fn, z, times, schedule))(z0)
        np.testing.assert_allclose(np.asarray(z_dpm), np.asarray(z_ddim),
                                   rtol=2e-4, atol=2e-5)


def test_dpm_solver_pp_second_order_beats_ddim_at_low_nfe():
    """On a smooth state-dependent score, 10-step DPM++(2M) should land
    closer to the fine-grid reference trajectory than 10-step DDIM does —
    that's the entire point of the second-order correction."""
    from interpolated_diffusion_tpu.ops.ddpm import (
        ddim_scan, dpm_solver_pp_scan,
    )

    schedule = _sched(1000)
    B, T, D = 2, 6, 2
    w = jax.random.normal(jax.random.PRNGKey(7), (D, D)) * 0.4

    def fn(z, t):
        return jnp.tanh(z @ w)

    z0 = jax.random.normal(jax.random.PRNGKey(8), (B, T, D))
    ref_times = jnp.asarray(make_timesteps(1000, 200))
    z_ref, _ = jax.jit(lambda z: ddim_scan(fn, z, ref_times, schedule))(z0)

    times = jnp.asarray(make_timesteps(1000, 10))
    z_ddim, _ = jax.jit(lambda z: ddim_scan(fn, z, times, schedule))(z0)
    z_dpm, _ = jax.jit(
        lambda z: dpm_solver_pp_scan(fn, z, times, schedule))(z0)
    err_ddim = float(jnp.abs(z_ddim - z_ref).mean())
    err_dpm = float(jnp.abs(z_dpm - z_ref).mean())
    assert np.isfinite(err_dpm)
    assert err_dpm < err_ddim, (err_dpm, err_ddim)
