"""Whole-block fused kernel (kernels/fused_block.py) parity.

Contract: with identical params, the fused path (policy
ID_TPU_SMALL_ATTN=block) computes the same function as the unfused
TransformerBlock — XLA-twin fallback on CPU, Pallas kernel in interpret
mode, and gradients through the custom_vjp — so checkpoints and training
are interchangeable between policies.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from interpolated_diffusion_tpu.kernels.fused_block import (
    _xla_block, fused_film_block,
)
from interpolated_diffusion_tpu.models.transformer import TransformerBlock

B, L, D, H, F = 8, 64, 48, 4, 96


def _block_and_inputs(key=0):
    blk = TransformerBlock(d_model=D, n_heads=H, d_ff=F)
    x = jax.random.normal(jax.random.PRNGKey(key), (B, L, D))
    cond = jax.random.normal(jax.random.PRNGKey(key + 1), (B, 16))
    params = blk.init(jax.random.PRNGKey(2), x, cond)["params"]
    return blk, params, x, cond


def _flat_args(params, cond_gb1, cond_gb2):
    p = params
    return (cond_gb1, cond_gb2,
            p["norm1"]["scale"], p["norm1"]["bias"],
            p["norm2"]["scale"], p["norm2"]["bias"],
            p["qkv"]["kernel"], p["qkv"]["bias"],
            p["attn_out"]["kernel"], p["attn_out"]["bias"],
            p["ff1"]["kernel"], p["ff1"]["bias"],
            p["ff2"]["kernel"], p["ff2"]["bias"])


def _gb(params, cond, name):
    return cond @ params[name]["kernel"] + params[name]["bias"]


def test_policy_block_matches_dense_path(monkeypatch):
    blk, params, x, cond = _block_and_inputs()
    monkeypatch.delenv("ID_TPU_SMALL_ATTN", raising=False)
    ref = blk.apply({"params": params}, x, cond)
    monkeypatch.setenv("ID_TPU_SMALL_ATTN", "block")
    out = blk.apply({"params": params}, x, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kernel_interpret_matches_xla_twin():
    blk, params, x, cond = _block_and_inputs()
    gb1 = _gb(params, cond, "film1")
    gb2 = _gb(params, cond, "film2")
    args = _flat_args(params, gb1, gb2)
    ref = _xla_block(x, *args, n_heads=H, use_film=True)
    out = fused_film_block(x, *args, n_heads=H, group_b=4, use_film=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # group padding: B=8 with G=3 pads to 9 and slices back
    out_pad = fused_film_block(x, *args, n_heads=H, group_b=3,
                               use_film=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_grads_match_dense_path(monkeypatch):
    blk, params, x, cond = _block_and_inputs()

    def loss(p, policy):
        if policy:
            monkeypatch.setenv("ID_TPU_SMALL_ATTN", "block")
        else:
            monkeypatch.delenv("ID_TPU_SMALL_ATTN", raising=False)
        return jnp.sum(blk.apply({"params": p}, x, cond) ** 2)

    from jax.flatten_util import ravel_pytree

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_blk = jax.grad(lambda p: loss(p, True))(params)
    flat_r, _ = ravel_pytree(g_ref)
    flat_b, _ = ravel_pytree(g_blk)
    np.testing.assert_allclose(np.asarray(flat_b), np.asarray(flat_r),
                               atol=5e-4, rtol=5e-3)


def test_no_film_variant():
    blk = TransformerBlock(d_model=D, n_heads=H, d_ff=F, use_film=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D))
    params = blk.init(jax.random.PRNGKey(2), x, None)["params"]
    ref = blk.apply({"params": params}, x, None)
    os.environ["ID_TPU_SMALL_ATTN"] = "block"
    try:
        out = blk.apply({"params": params}, x, None)
    finally:
        del os.environ["ID_TPU_SMALL_ATTN"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
