"""Scan-over-layers WanDiT: loop/scan equivalence + param layout converters.

The scan layout (`blocks/block`, params stacked on a leading layer axis,
executed via nn.scan + nn.remat) must be numerically identical to the
unrolled loop layout (`block_{i}`) — same math per layer, different
compilation strategy. Reference capability: per-block
torch.utils.checkpoint in src/models/transformer.py:79 and Wan
enable_gradient_checkpointing (train_keypoints_wansynth.py:305-306); the
scan form is the TPU-native improvement that bounds XLA's backward buffer
scheduling to one block.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpolated_diffusion_tpu.models.wan_dit import (

    WanDiT, stack_block_params, unstack_block_params,
)

CFG = dict(
    dim=48, n_layers=3, n_heads=4, ffn_dim=96, in_channels=4,
    out_channels=4, text_dim=32, max_seq_len=64, freq_dim=16,
)
pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)

SHAPES = dict(B=2, C=4, T=4, H=4, W=4, L_text=6)


def _inputs(key):
    k1, k2, k3 = jax.random.split(key, 3)
    s = SHAPES
    lat = jax.random.normal(k1, (s["B"], s["C"], s["T"], s["H"], s["W"]))
    t = jnp.array([3, 7], dtype=jnp.int32)
    ctx = jax.random.normal(k2, (s["B"], s["L_text"], CFG["text_dim"]))
    return lat, t, ctx


def _init_loop(lora_rank=0):
    model = WanDiT(**CFG, layer_mode="loop", lora_rank=lora_rank)
    lat, t, ctx = _inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), lat, t, ctx)["params"]
    return model, params, (lat, t, ctx)


@pytest.mark.parametrize("lora_rank", [0, 4])
def test_scan_matches_loop(lora_rank):
    loop_model, loop_params, (lat, t, ctx) = _init_loop(lora_rank)
    y_loop = loop_model.apply({"params": loop_params}, lat, t, ctx)

    scan_model = WanDiT(**CFG, layer_mode="scan", lora_rank=lora_rank,
                        use_remat=True)
    scan_params = stack_block_params(loop_params, CFG["n_layers"])
    y_scan = scan_model.apply({"params": scan_params}, lat, t, ctx)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_loop),
                               rtol=1e-5, atol=1e-5)


def test_scan_init_shapes_match_stacked_loop():
    _, loop_params, (lat, t, ctx) = _init_loop()
    scan_model = WanDiT(**CFG, layer_mode="scan")
    scan_params = scan_model.init(jax.random.PRNGKey(2), lat, t, ctx)["params"]
    expect = stack_block_params(loop_params, CFG["n_layers"])
    flat_a = jax.tree_util.tree_map(jnp.shape, scan_params)
    flat_b = jax.tree_util.tree_map(jnp.shape, expect)
    assert jax.tree_util.tree_structure(flat_a) == jax.tree_util.tree_structure(flat_b)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, flat_a, flat_b)
    )


def test_stack_unstack_roundtrip():
    _, loop_params, _ = _init_loop()
    stacked = stack_block_params(loop_params, CFG["n_layers"])
    back = unstack_block_params(stacked, CFG["n_layers"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        loop_params, back,
    )


def test_stack_from_remat_groups():
    # loop mode with use_remat groups params under group_{g}/block_{j}
    model = WanDiT(**CFG, layer_mode="loop", use_remat=True, remat_group=2)
    lat, t, ctx = _inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), lat, t, ctx)["params"]
    stacked = stack_block_params(params, CFG["n_layers"])
    scan_model = WanDiT(**CFG, layer_mode="scan")
    y_scan = scan_model.apply({"params": stacked}, lat, t, ctx)
    y_loop = model.apply({"params": params}, lat, t, ctx)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_loop),
                               rtol=1e-5, atol=1e-5)


def test_scan_grads_flow():
    scan_model = WanDiT(**CFG, layer_mode="scan", lora_rank=2, use_remat=True)
    lat, t, ctx = _inputs(jax.random.PRNGKey(0))
    params = scan_model.init(jax.random.PRNGKey(1), lat, t, ctx)["params"]

    def loss(p):
        return jnp.mean(scan_model.apply({"params": p}, lat, t, ctx) ** 2)

    g = jax.grad(loss)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0
    )
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
