"""Ports of reference tests/test_corruption.py (linear exactness, anchor
preservation) on the JAX corruption ops."""
import jax
import jax.numpy as jnp
import numpy as np

from interpolated_diffusion_tpu.ops.keyframes import (
    interpolate_from_indices,
    interpolate_from_mask,
)


def test_interpolation_linear():
    x = jnp.array([[0.0], [2.0], [4.0], [6.0], [8.0]])
    mask = jnp.array([1, 0, 0, 0, 1], dtype=bool)
    y = interpolate_from_mask(x, mask)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_keyframe_clamp():
    T = 6
    x = jax.random.normal(jax.random.PRNGKey(0), (T, 2))
    mask = jnp.array([1, 0, 0, 0, 0, 1], dtype=bool)
    y = interpolate_from_mask(x, mask)
    r0 = (x - y) * (~mask)[:, None]
    np.testing.assert_allclose(np.asarray(r0[np.asarray(mask)]), 0.0)


def test_interpolate_from_indices_linear_exact():
    B, T, D = 2, 9, 2
    slope = jnp.arange(T, dtype=jnp.float32)[None, :, None]
    x = jnp.broadcast_to(slope, (B, T, D)) * jnp.array([1.0, -2.0])
    idx = jnp.array([[0, 4, 8], [0, 3, 8]], dtype=jnp.int32)
    vals = jnp.take_along_axis(x, idx[..., None].astype(jnp.int32).repeat(D, -1), axis=1)
    y = interpolate_from_indices(idx, vals, T)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_interpolate_outside_hull_keeps_input():
    # interpolate_from_mask: frames before first / after last anchor keep x.
    T = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (T, 3))
    mask = jnp.zeros(T, dtype=bool).at[2].set(True).at[5].set(True)
    y = interpolate_from_mask(x, mask)
    np.testing.assert_allclose(np.asarray(y[:2]), np.asarray(x[:2]))
    np.testing.assert_allclose(np.asarray(y[6:]), np.asarray(x[6:]))
