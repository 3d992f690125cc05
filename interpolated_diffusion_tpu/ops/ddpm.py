"""DDPM/DDIM core math as pure JAX functions.

Capability parity with reference src/diffusion/ddpm.py (forward noising,
x0-from-eps, deterministic+stochastic DDIM step, DDPM ancestral step, timestep
subsequencing, full reverse loops with keyframe-masked noise). TPU-native
design: reverse loops are `jax.lax.scan` over a statically-shaped timestep
table so the whole sampler compiles into one XLA program; randomness is
explicit `jax.random` key threading.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule


def _gather(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and right-pad dims for broadcasting.

    t may be [B] (per-sample timestep) or [B, T] (per-token timestep).
    """
    out = table[t]
    while out.ndim < ndim:
        out = out[..., None]
    return out


def q_sample(
    x0: jnp.ndarray,
    t: jnp.ndarray,
    schedule: DiffusionSchedule,
    noise: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward noising: x_t = sqrt(a_bar_t) x0 + sqrt(1-a_bar_t) eps."""
    if noise is None:
        if key is None:
            raise ValueError("q_sample needs either explicit noise or a PRNG key")
        noise = jax.random.normal(key, x0.shape, dtype=x0.dtype)
    sab = _gather(schedule.sqrt_alpha_bar, t, x0.ndim)
    somab = _gather(schedule.sqrt_one_minus_alpha_bar, t, x0.ndim)
    return sab * x0 + somab * noise, noise


def predict_x0_from_eps(
    xt: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray, schedule: DiffusionSchedule
) -> jnp.ndarray:
    sab = _gather(schedule.sqrt_alpha_bar, t, xt.ndim)
    somab = _gather(schedule.sqrt_one_minus_alpha_bar, t, xt.ndim)
    return (xt - somab * eps) / jnp.maximum(sab, 1e-8)


def ddim_step(
    xt: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    schedule: DiffusionSchedule,
    eta: float = 0.0,
    key: Optional[jax.Array] = None,
    x0_clip: Optional[float] = None,
) -> jnp.ndarray:
    """One DDIM update from t to t_prev (deterministic when eta == 0).

    x0_clip bounds the intermediate x0 estimate to ±x0_clip. At the terminal
    timestep of a cosine-1000 schedule √ᾱ ≈ 4.9e-5, so the x0-from-eps divide
    amplifies model error ~2e4× — one bad first step throws the iterate so
    far off-distribution the sampler never recovers (the round-2 D4RL
    divergence; only data dims clipped per-step elsewhere survive). A static
    clamp keeps every dim bounded without changing in-range numerics.
    """
    ab_t = _gather(schedule.alpha_bar, t, xt.ndim)
    ab_prev = _gather(schedule.alpha_bar, t_prev, xt.ndim)
    x0 = (xt - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
    if x0_clip is not None and x0_clip > 0:
        x0 = jnp.clip(x0, -float(x0_clip), float(x0_clip))
    if eta == 0.0:
        return jnp.sqrt(ab_prev) * x0 + jnp.sqrt(1.0 - ab_prev) * eps
    sigma = (
        eta
        * jnp.sqrt((1.0 - ab_prev) / (1.0 - ab_t))
        * jnp.sqrt(1.0 - ab_t / ab_prev)
    )
    if key is None:
        raise ValueError("stochastic DDIM (eta>0) needs a PRNG key")
    noise = jax.random.normal(key, xt.shape, dtype=xt.dtype)
    return (
        jnp.sqrt(ab_prev) * x0
        + jnp.sqrt(jnp.maximum(1.0 - ab_prev - sigma**2, 0.0)) * eps
        + sigma * noise
    )


def ddpm_step(
    xt: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    schedule: DiffusionSchedule,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """One ancestral DDPM update; adds no noise at t == 0."""
    betas = _gather(schedule.betas, t, xt.ndim)
    alphas = _gather(schedule.alphas, t, xt.ndim)
    ab = _gather(schedule.alpha_bar, t, xt.ndim)
    somab = jnp.sqrt(1.0 - ab)
    mean = (1.0 / jnp.sqrt(alphas)) * (xt - (betas / somab) * eps)
    if key is None:
        return mean  # caller guarantees t == 0
    noise = jax.random.normal(key, xt.shape, dtype=xt.dtype)
    # Zero the noise where t == 0 (jit-friendly branchless form of the
    # reference's `if torch.all(t == 0)` early return).
    is_zero = _gather(jnp.arange(schedule.n_timesteps) == 0, t, xt.ndim)
    return mean + jnp.where(is_zero, 0.0, jnp.sqrt(betas) * noise)


def make_timesteps(n_train: int, steps: int, schedule: str = "linear") -> np.ndarray:
    """Descending timestep subsequence (host-side, static).

    Matches the reference's linear / quadratic / sqrt spacings including the
    dedup + forced-{0, n_train-1} endpoints, returned high-to-low.
    """
    if steps <= 1:
        return np.array([n_train - 1, 0], dtype=np.int32)
    if steps >= n_train:
        return np.arange(n_train - 1, -1, -1, dtype=np.int32)
    if schedule == "quadratic":
        t = np.linspace(0.0, 1.0, steps)
        times = (t * t * (n_train - 1)).astype(np.int64)
    elif schedule == "sqrt":
        t = np.linspace(0.0, 1.0, steps)
        times = (np.sqrt(t) * (n_train - 1)).astype(np.int64)
    else:
        times = np.linspace(0, n_train - 1, steps).astype(np.int64)
    times = np.unique(times)
    if times[0] != 0:
        times = np.concatenate([[0], times])
    if times[-1] != n_train - 1:
        times = np.concatenate([times, [n_train - 1]])
    return times[::-1].astype(np.int32).copy()


ModelFn = Callable[..., jnp.ndarray]


def ddim_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    key: jax.Array,
    shape: Tuple[int, ...],
    steps: int,
    *,
    eta: float = 0.0,
    time_spacing: str = "linear",
    keep_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full DDIM reverse loop as a single lax.scan.

    model_fn(x_t, t) -> eps, closed over params/conditioning by the caller.
    keep_mask ([B, T] bool): positions zeroed after every step, mirroring the
    reference's keyframe-masked noise (ddim_sample in ddpm.py).
    """
    times = jnp.asarray(make_timesteps(schedule.n_timesteps, steps, time_spacing))
    B = shape[0]
    key, k_init = jax.random.split(key)
    xt = jax.random.normal(k_init, shape, dtype=jnp.float32)
    if keep_mask is not None:
        xt = xt * (~keep_mask)[..., None]

    t_pairs = jnp.stack([times[:-1], times[1:]], axis=-1)  # [S, 2]
    step_keys = jax.random.split(key, t_pairs.shape[0])

    def body(x, inp):
        (t_now, t_prev), k = inp
        t_b = jnp.full((B,), t_now, dtype=jnp.int32)
        tp_b = jnp.full((B,), t_prev, dtype=jnp.int32)
        eps = model_fn(x, t_b)
        if eta == 0.0:
            x = ddim_step(x, eps, t_b, tp_b, schedule, eta=0.0)
        else:
            x = ddim_step(x, eps, t_b, tp_b, schedule, eta=eta, key=k)
        if keep_mask is not None:
            x = x * (~keep_mask)[..., None]
        return x, None

    xt, _ = jax.lax.scan(body, xt, (t_pairs, step_keys))
    return xt


def ddpm_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    key: jax.Array,
    shape: Tuple[int, ...],
    *,
    keep_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full ancestral DDPM reverse loop as a single lax.scan."""
    n = schedule.n_timesteps
    B = shape[0]
    key, k_init = jax.random.split(key)
    xt = jax.random.normal(k_init, shape, dtype=jnp.float32)
    if keep_mask is not None:
        xt = xt * (~keep_mask)[..., None]
    times = jnp.arange(n - 1, -1, -1, dtype=jnp.int32)
    step_keys = jax.random.split(key, n)

    def body(x, inp):
        t_now, k = inp
        t_b = jnp.full((B,), t_now, dtype=jnp.int32)
        eps = model_fn(x, t_b)
        x = ddpm_step(x, eps, t_b, schedule, key=k)
        if keep_mask is not None:
            x = x * (~keep_mask)[..., None]
        return x, None

    xt, _ = jax.lax.scan(body, xt, (times, step_keys))
    return xt


def ddim_scan(
    eps_fn,
    z: jnp.ndarray,
    times: jnp.ndarray,
    schedule,
    post=None,
    cache_interval: int = 1,
    delta0: jnp.ndarray | None = None,
    collect: bool = False,
    x0_clip: float | None = None,
):
    """Shared DDIM reverse scan with optional FORA-style block caching.

    eps_fn(z, t_b, *, blocks_delta=None, return_delta=False) — with
    cache_interval > 1 the model's block stack is evaluated only every
    interval-th step and its residual (`delta0`-shaped) reused in between
    (models/denoisers.py / models/wan_dit.py implement the two kwargs).
    post(z) runs after every ddim_step (known-value clamping, pos clipping).
    Returns z, or (z, stacked per-step states) with collect=True.
    """
    B = z.shape[0]
    post = post or (lambda x: x)
    t_pairs = jnp.stack([times[:-1], times[1:]], axis=-1)
    interval = max(1, int(cache_interval))

    if interval == 1:
        def body(z, pair):
            t_b = jnp.full((B,), pair[0], dtype=jnp.int32)
            eps = eps_fn(z, t_b)
            z = post(ddim_step(z, eps, t_b,
                               jnp.full((B,), pair[1], dtype=jnp.int32),
                               schedule, x0_clip=x0_clip))
            return z, (z if collect else None)

        return jax.lax.scan(body, z, t_pairs)

    if delta0 is None:
        raise ValueError("cache_interval > 1 needs delta0 (residual shape)")

    def body(carry, inp):
        z, delta = carry
        pair, i = inp
        t_b = jnp.full((B,), pair[0], dtype=jnp.int32)

        def full_step(z, _):
            return eps_fn(z, t_b, return_delta=True)

        def cached_step(z, delta):
            return eps_fn(z, t_b, blocks_delta=delta), delta

        eps, delta = jax.lax.cond(i % interval == 0, full_step, cached_step,
                                  z, delta)
        z = post(ddim_step(z, eps, t_b,
                           jnp.full((B,), pair[1], dtype=jnp.int32), schedule,
                           x0_clip=x0_clip))
        return (z, delta), (z if collect else None)

    (z, _), ys = jax.lax.scan(body, (z, delta0),
                              (t_pairs, jnp.arange(t_pairs.shape[0])))
    return z, ys


def pfdiff_scan(
    eps_fn,
    z: jnp.ndarray,
    times: jnp.ndarray,
    schedule,
    post=None,
    collect: bool = False,
    x0_clip: float | None = None,
):
    """PFDiff-style DDIM scan: ~half the model evals for the same grid.

    Training-free first-order acceleration in the spirit of PFDiff
    (arXiv 2408.08822): the previous step's score is reused as a predictor —
    a "springboard" DDIM hop t_i → t_{i+1} with the PAST eps positions a
    single fresh model eval at the intermediate state, and that "foresight"
    eps then drives one double-length jump t_i → t_{i+2} from the original
    state. Per pair of grid intervals this costs ONE eval instead of two
    (NFE = 1 + ceil((S-1)/2) for S intervals; odd tails take a plain step).

    Exactness property (tested): DDIM's x0-parameterization is transitive in
    eps, so for an eps that doesn't change between adjacent grid points this
    reproduces plain DDIM on the same grid bit-for-bit — the method only
    spends error where the score actually moves.

    Same contract as ddim_scan(interval=1): eps_fn(z, t_b) -> eps, post(z)
    applied after every committed state. collect=True stacks the committed
    states (one per springboard group — fewer entries than ddim_scan's).
    Not composable with FORA block caching (both substitute model evals).
    """
    B = z.shape[0]
    post = post or (lambda x: x)
    n_t = int(times.shape[0])            # S+1 grid points, S intervals
    n_int = n_t - 1
    if n_int < 2:
        return ddim_scan(eps_fn, z, times, schedule, post=post,
                         collect=collect, x0_clip=x0_clip)

    tb = lambda t: jnp.full((B,), t, dtype=jnp.int32)

    # warmup: one full eval + plain DDIM step over the first interval
    eps_past = eps_fn(z, tb(times[0]))
    z = post(ddim_step(z, eps_past, tb(times[0]), tb(times[1]), schedule,
                       x0_clip=x0_clip))

    # groups of two intervals: (t_i, t_mid, t_next) triples over the rest
    rem = n_int - 1
    n_groups = rem // 2
    if n_groups > 0:
        idx = 1 + 2 * jnp.arange(n_groups)
        triples = jnp.stack([times[idx], times[idx + 1], times[idx + 2]],
                            axis=-1)                      # [G, 3]

        def body(carry, tri):
            z, eps_past = carry
            t_i, t_mid, t_next = tri[0], tri[1], tri[2]
            # post() on the springboard state too: ddim_scan applies post
            # before every model eval (known-value clamping / pos clipping),
            # and the denoiser must see the same invariant here
            z_mid = post(ddim_step(z, eps_past, tb(t_i), tb(t_mid), schedule,
                                   x0_clip=x0_clip))
            eps_mid = eps_fn(z_mid, tb(t_mid))
            z = post(ddim_step(z, eps_mid, tb(t_i), tb(t_next), schedule,
                               x0_clip=x0_clip))
            return (z, eps_mid), (z if collect else None)

        (z, eps_past), ys = jax.lax.scan(body, (z, eps_past), triples)
    else:
        ys = None

    if rem % 2 == 1:                     # odd tail: one plain full step
        eps = eps_fn(z, tb(times[-2]))
        z = post(ddim_step(z, eps, tb(times[-2]), tb(times[-1]), schedule,
                           x0_clip=x0_clip))
        if collect and ys is not None:
            ys = jnp.concatenate([ys, z[None]], axis=0)
    return z, ys


SOLVERS = ("ddim", "pfdiff", "dpm")


def run_solver(
    solver: str,
    eps_fn,
    z: jnp.ndarray,
    times: jnp.ndarray,
    schedule,
    post=None,
    collect: bool = False,
    cache_interval: int = 1,
    delta0: jnp.ndarray | None = None,
    x0_clip: float | None = None,
):
    """One dispatch point for the reverse-scan solver family.

    ddim    exact baseline; composes with FORA block caching
            (cache_interval > 1 + delta0).
    pfdiff  past-score springboard — NFE 1+⌈(S−1)/2⌉ on the same grid.
    dpm     DPM-Solver++(2M) — one eval/step, 2nd-order accuracy.

    pfdiff/dpm replace model-eval structure themselves, so they refuse to
    combine with FORA caching rather than silently double-approximate.
    """
    if solver not in SOLVERS:
        raise ValueError(f"unknown solver {solver!r}; pick from {SOLVERS}")
    if solver != "ddim":
        if cache_interval > 1:
            raise ValueError(
                f"solver {solver!r} and cache_interval > 1 both substitute "
                "model evals — pick one")
        fn = pfdiff_scan if solver == "pfdiff" else dpm_solver_pp_scan
        return fn(eps_fn, z, times, schedule, post=post, collect=collect,
                  x0_clip=x0_clip)
    return ddim_scan(eps_fn, z, times, schedule, post=post,
                     cache_interval=cache_interval, delta0=delta0,
                     collect=collect, x0_clip=x0_clip)


def dpm_solver_pp_scan(
    eps_fn,
    z: jnp.ndarray,
    times: jnp.ndarray,
    schedule,
    post=None,
    collect: bool = False,
    x0_clip: float | None = None,
):
    """DPM-Solver++(2M): second-order multistep ODE solver, one eval/step.

    Data-prediction multistep form (Lu et al., arXiv 2211.01095 §4): with
    λ = log(α/σ), h_i = λ_i − λ_{i−1}, r_i = h_{i−1}/h_i and m = x0-pred,

        x_i = (σ_i/σ_{i−1}) x_{i−1} − α_i (e^{−h_i} − 1)
              [(1 + 1/(2 r_i)) m_{i−1} − 1/(2 r_i) m_{i−2}]

    The first transition is first-order, which for an x0-prediction that
    doesn't move between grid points coincides with DDIM exactly (tested) —
    the 2nd-order correction only spends error where x0 actually moves, so
    ~10 steps match 20-step DDIM quality at half the NFE. Same contract as
    ddim_scan(interval=1); eps-predicting models are converted to x0
    internally via the schedule.
    """
    B = z.shape[0]
    post = post or (lambda x: x)
    ab = schedule.alpha_bar[times]                    # [S+1] descending t
    alpha = jnp.sqrt(ab)
    sigma = jnp.sqrt(1.0 - ab)
    lam = jnp.log(alpha) - jnp.log(sigma)

    tb = lambda t: jnp.full((B,), t, dtype=jnp.int32)

    n_t = int(times.shape[0])
    if n_t < 2:
        return z, None

    # first-order warmup: t_0 → t_1 (all schedule coefficients are scalars —
    # they broadcast over any state rank)
    def _clip_m(m):
        if x0_clip is not None and x0_clip > 0:
            return jnp.clip(m, -float(x0_clip), float(x0_clip))
        return m

    eps0 = eps_fn(z, tb(times[0]))
    m_prev = _clip_m((z - sigma[0] * eps0) / jnp.maximum(alpha[0], 1e-8))
    h_prev = lam[1] - lam[0]
    z = post((sigma[1] / sigma[0]) * z
             - alpha[1] * (jnp.exp(-h_prev) - 1.0) * m_prev)

    if n_t == 2:
        return z, (z[None] if collect else None)

    idx = jnp.arange(1, n_t - 1)
    stacked = jnp.stack([
        sigma[idx], sigma[idx + 1], alpha[idx + 1],
        lam[idx + 1] - lam[idx],                      # h_i
    ], axis=-1)

    def body(carry, row):
        z, m_prev, h_prev, i = carry
        sig_i, sig_n, alp_n, h = row[0], row[1], row[2], row[3]
        # model eval at the CURRENT state/time (dynamic index via switch-free
        # gather: times is a traced table, t_b built from the carried index)
        eps = eps_fn(z, jnp.full((B,), jnp.take(times, i), jnp.int32))
        sig_c = jnp.take(sigma, i)
        alp_c = jnp.take(alpha, i)
        m = _clip_m((z - sig_c * eps) / jnp.maximum(alp_c, 1e-8))
        r = h_prev / h
        D = (1.0 + 1.0 / (2.0 * r)) * m - (1.0 / (2.0 * r)) * m_prev
        z = post((sig_n / sig_i) * z - alp_n * (jnp.exp(-h) - 1.0) * D)
        return (z, m, h, i + 1), (z if collect else None)

    (z, _, _, _), ys = jax.lax.scan(
        body, (z, m_prev, h_prev, jnp.asarray(1, jnp.int32)), stacked)
    return z, ys
