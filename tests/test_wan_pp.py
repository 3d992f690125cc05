"""Pipeline-parallel WanDiT (models/wan_pp.py): the pipelined block stack
must reproduce the plain scan-mode forward exactly, and train (grads reach
the stacked block params through the pipeline closure)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from interpolated_diffusion_tpu.models.wan_dit import WanDiT
from interpolated_diffusion_tpu.models.wan_pp import wan_pp_apply

pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)

B, C, T, H, W = 4, 4, 4, 4, 4
L_TEXT, TEXT_DIM = 5, 32


def _model():
    return WanDiT(
        dim=32, n_layers=8, n_heads=4, ffn_dim=64,
        in_channels=C, out_channels=C, text_dim=TEXT_DIM,
        patch_size=(1, 2, 2), max_seq_len=64, freq_dim=16,
        layer_mode="scan", dtype=jnp.float32,
    )


def _inputs(key):
    k1, k2, k3 = jax.random.split(key, 3)
    latents = jax.random.normal(k1, (B, C, T, H, W))
    t = jax.random.randint(k2, (B,), 0, 1000)
    context = jax.random.normal(k3, (B, L_TEXT, TEXT_DIM))
    return latents, t, context


def _mesh():
    dev = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(dev, axis_names=("data", "pipe"))


def test_wan_pp_forward_matches_scan():
    model = _model()
    latents, t, context = _inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), latents, t, context)
    ref = model.apply(params, latents, t, context)
    out = jax.jit(lambda p: wan_pp_apply(
        model, p, latents, t, context, mesh=_mesh(), n_microbatches=2))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_wan_pp_abs_time_rope():
    """frame_indices makes rope batched [B, ...] — the pipeline must
    microbatch it alongside the activations."""
    model = _model()
    latents, t, context = _inputs(jax.random.PRNGKey(2))
    fi = jnp.sort(jax.random.randint(jax.random.PRNGKey(3), (B, T), 0, 64), axis=1)
    params = model.init(jax.random.PRNGKey(4), latents, t, context,
                        frame_indices=fi)
    ref = model.apply(params, latents, t, context, frame_indices=fi)
    out = jax.jit(lambda p: wan_pp_apply(
        model, p, latents, t, context, mesh=_mesh(), n_microbatches=2,
        frame_indices=fi))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_wan_pp_grads_match_scan():
    model = _model()
    latents, t, context = _inputs(jax.random.PRNGKey(5))
    params = model.init(jax.random.PRNGKey(6), latents, t, context)
    tgt = jax.random.normal(jax.random.PRNGKey(7), (B, C, T, H, W))

    def loss_pp(p):
        out = wan_pp_apply(model, p, latents, t, context,
                           mesh=_mesh(), n_microbatches=2)
        return jnp.mean((out - tgt) ** 2)

    def loss_seq(p):
        return jnp.mean((model.apply(p, latents, t, context) - tgt) ** 2)

    lp, gp = jax.jit(jax.value_and_grad(loss_pp))(params)
    ls, gs = jax.jit(jax.value_and_grad(loss_seq))(params)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-6)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(gs))
    assert flat_p and len(flat_p) == len(flat_s)
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]),
            rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_wan_pp_3d_partial_tp():
    """3D composition on (data=2, pipe=2, model=2): WanDiT block stack
    pipelined (manual pipe), q/k/v/ffn Megatron-split on `model` via GSPMD
    inside each stage (pp_tp_param_sharding), batch on `data`."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from interpolated_diffusion_tpu.parallel.pp import pp_tp_param_sharding

    dev = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(dev, axis_names=("data", "pipe", "model"))
    model = _model()
    latents, t, context = _inputs(jax.random.PRNGKey(8))
    params = model.init(jax.random.PRNGKey(9), latents, t, context)
    ref = model.apply(params, latents, t, context)

    blocks = params["params"]["blocks"]
    b_sh = pp_tp_param_sharding(blocks, mesh)
    q = b_sh["block"]["self_attn"]["q_proj"]["kernel"].spec
    assert q == P("pipe", None, "model")
    placed = dict(params["params"])
    placed["blocks"] = jax.device_put(blocks, b_sh)
    placed = {"params": placed}

    out = jax.jit(lambda p: wan_pp_apply(
        model, p, latents, t, context, mesh=mesh, n_microbatches=2,
        mode="partial"))(placed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_wan_pp_with_moe_ffn():
    """MoE blocks run through the pipeline (EP experts replicated here);
    the routing aux loss is unavailable inside the pipelined stack — train
    MoE routers in plain scan mode, pipeline for inference/finetune."""
    model = WanDiT(
        dim=32, n_layers=8, n_heads=4, ffn_dim=64,
        in_channels=C, out_channels=C, text_dim=TEXT_DIM,
        patch_size=(1, 2, 2), max_seq_len=64, freq_dim=16,
        layer_mode="scan", ffn_mode="moe", n_experts=2,
        capacity_factor=4.0, dtype=jnp.float32,
    )
    latents, t, context = _inputs(jax.random.PRNGKey(20))
    params = model.init(jax.random.PRNGKey(21), latents, t, context)
    ref = model.apply(params, latents, t, context)
    out = jax.jit(lambda p: wan_pp_apply(
        model, p, latents, t, context, mesh=_mesh(), n_microbatches=2))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
