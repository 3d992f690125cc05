"""Switch MoE FFN (models/moe.py) + expert parallelism (parallel/ep.py):
dense one-hot dispatch must equal a per-token loop oracle, EP sharding must
be numerics-neutral, and the WanDiT integration must run and train."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from interpolated_diffusion_tpu.models.moe import SwitchFFN
from interpolated_diffusion_tpu.parallel.ep import apply_ep, ep_param_sharding

pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)

DIM, FFN, E = 16, 32, 4


def _ffn(capacity_factor=8.0):
    # generous capacity → no token drops → loop-oracle comparable
    return SwitchFFN(dim=DIM, ffn_dim=FFN, n_experts=E,
                     capacity_factor=capacity_factor)


def _loop_oracle(params, x2):
    """Per-token routing oracle in numpy: argmax expert, plain FFN."""
    r = params["router"]
    logits = x2 @ np.asarray(r["kernel"]) + np.asarray(r["bias"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    e = logits.argmax(-1)
    gate = probs[np.arange(len(e)), e]
    k_in, b_in = np.asarray(params["ffn_in"]), np.asarray(params["ffn_in_bias"])
    k_out = np.asarray(params["ffn_out"])
    out = np.zeros_like(x2)
    for i, ei in enumerate(e):
        h = x2[i] @ k_in[ei] + b_in[ei]
        # gelu(tanh approx) — match jax nn.gelu(approximate=True)
        h = 0.5 * h * (1.0 + np.tanh(np.sqrt(2 / np.pi) * (h + 0.044715 * h**3)))
        out[i] = gate[i] * (h @ k_out[ei])
    return out


def test_switch_ffn_matches_loop_oracle():
    model = _ffn()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, DIM))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    y, aux = model.apply({"params": params}, x)
    assert y.shape == x.shape and np.isfinite(float(aux))
    ref = _loop_oracle(params, np.asarray(x.reshape(-1, DIM), np.float64))
    np.testing.assert_allclose(np.asarray(y).reshape(-1, DIM), ref,
                               rtol=1e-4, atol=1e-5)


def test_switch_ffn_capacity_drops_are_zero():
    """capacity_factor → tiny: overflowing tokens get zero output (identity
    residual at the call site), never garbage."""
    model = SwitchFFN(dim=DIM, ffn_dim=FFN, n_experts=E, capacity_factor=0.01)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 12, DIM))
    params = model.init(jax.random.PRNGKey(3), x)["params"]
    y, _ = model.apply({"params": params}, x)
    # C = 1 token per expert → at most E tokens produce output
    nz = (np.abs(np.asarray(y)).max(-1) > 1e-9).sum()
    assert nz <= E


def test_switch_ffn_aux_loss_uniform_is_one():
    """Perfectly uniform routing drives the Switch aux loss to its minimum
    E * E * (1/E)·(1/E) = 1."""
    model = _ffn()
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 8, DIM))
    params = model.init(jax.random.PRNGKey(5), x)["params"]
    _, aux = model.apply({"params": params}, x)
    assert float(aux) >= 1.0 - 1e-6  # 1 is the lower bound


def test_expert_parallel_matches_replicated():
    dev = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(dev, axis_names=("data", "expert"))
    model = _ffn()
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 6, DIM))
    params = model.init(jax.random.PRNGKey(7), x)["params"]
    y_ref, aux_ref = model.apply({"params": params}, x)

    sh = ep_param_sharding(params, mesh)
    assert sh["ffn_in"].spec == P("expert", None, None)
    assert sh["router"]["kernel"].spec == P()
    ps = apply_ep(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    y, aux = jax.jit(lambda p, x: model.apply({"params": p}, x))(ps, xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-6)


def test_expert_parallel_grads_match():
    dev = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(dev, axis_names=("data", "expert"))
    model = _ffn()
    x = jax.random.normal(jax.random.PRNGKey(8), (4, 6, DIM))
    params = model.init(jax.random.PRNGKey(9), x)["params"]

    def loss(p, x):
        y, aux = model.apply({"params": p}, x)
        return jnp.mean(y ** 2) + 0.01 * aux

    gs = jax.jit(jax.grad(loss))(params, x)
    gp = jax.jit(jax.grad(loss))(apply_ep(params, mesh),
                                 jax.device_put(x, NamedSharding(mesh, P("data"))))
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_wan_dit_moe_runs_and_trains():
    from interpolated_diffusion_tpu.models.wan_dit import WanDiT

    for layer_mode in ("loop", "scan"):
        model = WanDiT(
            dim=32, n_layers=2, n_heads=4, ffn_dim=64, in_channels=4,
            out_channels=4, text_dim=16, patch_size=(1, 2, 2), freq_dim=16,
            ffn_mode="moe", n_experts=4, capacity_factor=2.0,
            layer_mode=layer_mode,
        )
        lat = jax.random.normal(jax.random.PRNGKey(10), (2, 4, 2, 4, 4))
        txt = jax.random.normal(jax.random.PRNGKey(11), (2, 3, 16))
        t = jnp.zeros((2,), jnp.int32)
        params = model.init(jax.random.PRNGKey(12), lat, t, txt)

        def loss(p):
            out, inter = model.apply(p, lat, t, txt,
                                     mutable=["intermediates"])
            auxes = jax.tree_util.tree_leaves(inter)
            return jnp.mean(out ** 2) + 0.01 * sum(jnp.sum(a) for a in auxes)

        l, g = jax.jit(jax.value_and_grad(loss))(params)
        assert np.isfinite(float(l))
        moe_grads = [x for pth, x in jax.tree_util.tree_leaves_with_path(g)
                     if "moe_ffn" in jax.tree_util.keystr(pth)]
        assert moe_grads and all(np.isfinite(np.asarray(x)).all()
                                 for x in moe_grads)


def test_phase1_trainer_moe_cli(tmp_path):
    """The Phase-1 Wan trainer runs with --ffn_mode moe end-to-end and the
    checkpoint meta records the MoE config for sampler-side rebuilds."""
    import json
    import os

    from interpolated_diffusion_tpu.train.train_keypoints_wansynth import (
        main as p1_main,
    )

    out = str(tmp_path / "p1moe")
    p1_main(["--num_samples", "12", "--T", "9", "--latent_c", "4",
             "--latent_h", "8", "--latent_w", "8", "--text_len", "8",
             "--text_dim", "64", "--wan_dim", "64", "--wan_layers", "2",
             "--wan_heads", "2", "--wan_ffn", "128", "--attn_mode", "dense",
             "--use_remat", "0", "--batch", "2", "--steps", "2",
             "--save_every", "2", "--log_every", "1", "--bf16", "0",
             "--K", "3", "--N_train", "20", "--lora_rank", "0",
             "--ffn_mode", "moe", "--n_experts", "2",
             "--out_dir", out])
    meta = json.load(open(os.path.join(out, "ckpt_2", "meta.json")))["meta"]
    assert meta["ffn_mode"] == "moe" and meta["n_experts"] == 2
