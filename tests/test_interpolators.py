"""Latent interpolator tests: grid sampling, flow warp, straighteners,
lerp-residual, Sinkhorn warper — invariants + vs-LERP behavior."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from interpolated_diffusion_tpu.ops.image import (

    avg_pool2d,
    cost_volume,
    grid_sample_bilinear,
    flow_to_grid,
    warp,
)


pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)

def test_grid_sample_identity():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 10))
    zero_flow = jnp.zeros((2, 2, 8, 10))
    y = warp(x, zero_flow)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_grid_sample_integer_shift():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 6, 6))
    flow = jnp.zeros((1, 2, 6, 6)).at[:, 0].set(1.0)  # sample from x+1
    y = warp(x, flow)
    np.testing.assert_allclose(
        np.asarray(y[0, 0, :, :-1]), np.asarray(x[0, 0, :, 1:]), atol=1e-5
    )


def test_grid_sample_border_padding():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 1, 4, 4)
    flow = jnp.full((1, 2, 4, 4), 10.0)  # way out of bounds -> border values
    y = warp(x, flow)
    np.testing.assert_allclose(np.asarray(y[0, 0, :, -1]), 15.0)


def test_avg_pool_and_cost_volume_shapes():
    z0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    z1 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    assert avg_pool2d(z0, 2).shape == (2, 4, 4, 4)
    cv = cost_volume(z0, z1, radius=2, downscale=2)
    assert cv.shape == (2, 25, 8, 8)
    # self-correlation peaks at zero displacement (center channel)
    cv_self = cost_volume(z0, z0, radius=1, downscale=1)
    center = cv_self[:, 4]
    assert float(center.mean()) >= float(cv_self.mean())


def test_flow_interpolator_anchors_exact_and_uncertainty():
    from interpolated_diffusion_tpu.models.flow_interpolator import LatentFlowInterpolator

    B, T, C, H, W = 2, 9, 4, 8, 8
    model = LatentFlowInterpolator(in_channels=C, base_channels=8,
                                   residual_blocks=1, time_mask=True, gap_cond=True)
    latents = jax.random.normal(jax.random.PRNGKey(0), (B, T, C, H, W))
    idx = jnp.broadcast_to(jnp.array([0, 4, 8], dtype=jnp.int32), (B, 3))
    params = model.init(jax.random.PRNGKey(1), latents, idx)
    out, conf = model.apply(params, latents, idx)
    assert out.shape == latents.shape and conf.shape == (B, T, H, W)
    got = jnp.take_along_axis(out, idx[:, :, None, None, None], axis=1)
    want = jnp.take_along_axis(latents, idx[:, :, None, None, None], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(conf[:, [0, 4, 8]]), 1.0)


def test_lerp_residual_endpoints_exact():
    from interpolated_diffusion_tpu.models.interpolators import LatentLerpResidualInterpolator

    model = LatentLerpResidualInterpolator(data_dim=8, hidden_dim=16, n_layers=2)
    z_a = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    z_b = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    params = model.init(jax.random.PRNGKey(2), z_a, z_b, jnp.zeros((4,)))
    for a, want in [(0.0, z_a), (1.0, z_b)]:
        z_hat, _ = model.apply(params, z_a, z_b, jnp.full((4,), a))
        np.testing.assert_allclose(np.asarray(z_hat), np.asarray(want), atol=1e-5)
    # zero-init residual head -> exact lerp at init
    z_hat, _ = model.apply(params, z_a, z_b, jnp.full((4,), 0.3))
    np.testing.assert_allclose(np.asarray(z_hat), np.asarray(0.7 * z_a + 0.3 * z_b), atol=1e-5)


def test_straightener_near_identity_at_init():
    from interpolated_diffusion_tpu.models.straightener import (
        LatentStraightener,
        LatentStraightenerTokenTransformer,
    )

    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    for model in [
        LatentStraightener(in_channels=4, hidden_channels=8, blocks=1),
        LatentStraightenerTokenTransformer(in_channels=4, patch_size=4, d_model=32,
                                           n_layers=1, n_heads=2, d_ff=64),
    ]:
        params = model.init(jax.random.PRNGKey(1), z)
        out = model.apply(params, z)
        np.testing.assert_allclose(np.asarray(out), np.asarray(z), atol=1e-5)
        z_hat, s = model.apply(params, z[:1], z[1:], jnp.array([0.5]),
                               method="interpolate_pair")
        np.testing.assert_allclose(
            np.asarray(z_hat), np.asarray(0.5 * z[:1] + 0.5 * z[1:]), atol=1e-4
        )


def test_sinkhorn_log_doubly_stochastic():
    from interpolated_diffusion_tpu.models.sinkhorn_warp import sinkhorn_log

    logits = jax.random.normal(jax.random.PRNGKey(0), (3, 6, 6))
    p = jnp.exp(sinkhorn_log(logits, 30))
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(p.sum(-2)), 1.0, atol=1e-3)


def test_sinkhorn_warper_identity_sequence():
    """On a static video, matching is the identity -> output ≈ LERP == frames."""
    from interpolated_diffusion_tpu.models.sinkhorn_warp import SinkhornWarpInterpolator

    B, T, C, H, W = 1, 5, 4, 8, 8
    frame = jax.random.normal(jax.random.PRNGKey(0), (B, 1, C, H, W))
    latents = jnp.broadcast_to(frame, (B, T, C, H, W))
    # sharp tau + low dustbin -> near-exact identity assignment
    model = SinkhornWarpInterpolator(in_channels=C, patch_size=4, win_size=2,
                                     global_mode="none", sinkhorn_iters=30,
                                     sinkhorn_tau=0.01, dustbin_logit=-6.0)
    idx = jnp.array([[0, 4]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(1), latents, idx)
    out, conf = model.apply(params, latents, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(latents), atol=1e-2)
    assert float(conf.min()) > 0.9


def test_sinkhorn_warper_translation_beats_lerp():
    """A translating pattern: warp interpolation should beat plain LERP."""
    from interpolated_diffusion_tpu.models.sinkhorn_warp import SinkhornWarpInterpolator

    T, C, H, W = 5, 2, 16, 16
    key = jax.random.PRNGKey(3)
    base = jax.random.normal(key, (C, H, W))
    frames = jnp.stack([jnp.roll(base, t, axis=2) for t in range(T)])  # move right
    latents = frames[None]
    idx = jnp.array([[0, 4]], dtype=jnp.int32)
    model = SinkhornWarpInterpolator(
        in_channels=C, patch_size=2, win_size=4, global_mode="phasecorr",
        angles_deg=(0.0,), sinkhorn_iters=20, sinkhorn_tau=0.05,
    )
    params = model.init(jax.random.PRNGKey(4), latents, idx)
    out, conf = model.apply(params, latents, idx)
    lerp = jnp.stack([
        (1 - t / 4) * latents[:, 0] + (t / 4) * latents[:, 4] for t in range(T)
    ], axis=1)
    mid = slice(1, 4)
    err_warp = float(((out[:, mid] - latents[:, mid]) ** 2).mean())
    err_lerp = float(((lerp[:, mid] - latents[:, mid]) ** 2).mean())
    assert err_warp < err_lerp, f"warp {err_warp} vs lerp {err_lerp}"


def test_sinkhorn_train_grads_finite_with_tail_windows():
    """tau/dustbin gradients stay finite when the token grid has 1x1 tail
    windows (hp % win != 0) and the SE(2) estimate is identity — the exact
    configuration where the fb-consistency residual is exactly 0 and a naive
    norm's gradient NaNs (regression for the _fb_conf safe-norm)."""
    from interpolated_diffusion_tpu.models.sinkhorn_warp import SinkhornWarpInterpolator
    from interpolated_diffusion_tpu.ops.keyframes import sample_fixed_k_indices_batch

    B, T, C, H, W = 2, 5, 4, 16, 16  # patch 4 -> 4x4 tokens, win 3 -> 1-wide tails
    model = SinkhornWarpInterpolator(
        in_channels=C, patch_size=4, win_size=3, global_mode="phasecorr",
        sinkhorn_iters=10, learn_tau=True, learn_dustbin=True, fb_sigma=2.0)
    latents = jax.random.normal(jax.random.PRNGKey(0), (B, T, C, H, W))
    idx, mask = sample_fixed_k_indices_batch(jax.random.PRNGKey(1), B, T, 3)
    params = model.init(jax.random.PRNGKey(2), latents, idx)["params"]

    def loss_fn(p):
        out, _ = model.apply({"params": p}, latents, idx)
        hidden = (~mask)[..., None, None, None]
        return (((out - latents) ** 2) * hidden).sum() / hidden.sum()

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat), grads
    # the scalars must actually receive signal, not be zeroed out
    assert abs(float(grads["tau_raw"])) > 0.0
    assert abs(float(grads["dustbin"])) > 0.0
