"""Runtime-form LoRA (LoRADense) — equivalence with merge-form and the
trainer-side param partition.

Reference semantics: src/models/lora.py (LoRALinear forward: y = Wx + b +
(alpha/r)·B(Ax); mark_only_lora_trainable). The TPU build applies the delta
to activations inside each Dense (models/wan_dit.py::LoRADense) and freezes
the base via a structural tree partition
(train/wansynth_common.py::split_lora_params) instead of requires_grad
masking — no merged weight copy is ever materialized.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from interpolated_diffusion_tpu.models.wan_dit import WanDiT
from interpolated_diffusion_tpu.train.wansynth_common import (

    join_lora_params,
    split_lora_params,
)

pytestmark = pytest.mark.slow  # heavy e2e tier: run with -m slow (fast tier must stay <5 min)

RANK = 4
ALPHA = 8.0


def _tiny_wan(lora_rank=0, lora_targets="attn,ffn"):
    return WanDiT(
        dim=32, n_layers=2, n_heads=2, ffn_dim=64, in_channels=4,
        out_channels=4, text_dim=16, patch_size=(1, 2, 2), attn_mode="dense",
        lora_rank=lora_rank, lora_alpha=ALPHA, lora_targets=lora_targets,
        dtype=jnp.float32,
    )


def _inputs(key):
    k1, k2 = jax.random.split(key)
    lat = jax.random.normal(k1, (2, 4, 3, 4, 4))
    t = jnp.array([3, 7], jnp.int32)
    ctx = jax.random.normal(k2, (2, 5, 16))
    return lat, t, ctx


@pytest.fixture(scope="module")
def lora_setup():
    wan = _tiny_wan(lora_rank=RANK)
    lat, t, ctx = _inputs(jax.random.PRNGKey(1))
    params = wan.init(jax.random.PRNGKey(0), lat, t, ctx)["params"]
    lora_tree, base = split_lora_params(params)
    return wan, params, lora_tree, base, (lat, t, ctx)


def test_partition_roundtrip_and_leaf_names(lora_setup):
    _, params, lora_tree, base, _ = lora_setup
    flat_l = traverse_util.flatten_dict(lora_tree)
    assert flat_l, "no LoRA leaves found"
    assert all(k[-1] in ("lora_A", "lora_B") for k in flat_l)
    # attn (self+cross q/k/v/o) and ffn (in/out) per block, 2 blocks, A+B each
    assert len(flat_l) == 2 * (8 + 2) * 2
    flat_b = traverse_util.flatten_dict(base)
    assert not any(k[-1] in ("lora_A", "lora_B") for k in flat_b)
    joined = traverse_util.flatten_dict(join_lora_params(lora_tree, base))
    assert joined.keys() == traverse_util.flatten_dict(params).keys()


def test_zero_init_matches_base_only_model(lora_setup):
    wan, params, _, base, (lat, t, ctx) = lora_setup
    out_lora = wan.apply({"params": params}, lat, t, ctx)
    # base partition has exactly the param paths of a lora_rank=0 model
    out_base = _tiny_wan(lora_rank=0).apply({"params": base}, lat, t, ctx)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_base),
                               atol=1e-6)


def test_runtime_matches_merged_weights(lora_setup):
    wan, _, lora_tree, base, (lat, t, ctx) = lora_setup
    key = jax.random.PRNGKey(2)
    flat = traverse_util.flatten_dict(lora_tree)
    rand = {}
    for k, v in flat.items():
        key, sub = jax.random.split(key)
        rand[k] = jax.random.normal(sub, v.shape) * 0.05
    lora_rand = traverse_util.unflatten_dict(rand)

    out_runtime = wan.apply(
        {"params": join_lora_params(lora_rand, base)}, lat, t, ctx)

    # hand-merge: W' = W + (alpha/r)·A·B at every adapted kernel
    merged = dict(traverse_util.flatten_dict(base))
    for k in rand:
        if k[-1] == "lora_A":
            kk = k[:-1] + ("kernel",)
            merged[kk] = merged[kk] + (ALPHA / RANK) * (
                rand[k] @ rand[k[:-1] + ("lora_B",)])
    out_merged = _tiny_wan(lora_rank=0).apply(
        {"params": traverse_util.unflatten_dict(merged)}, lat, t, ctx)
    np.testing.assert_allclose(np.asarray(out_runtime), np.asarray(out_merged),
                               rtol=1e-4, atol=1e-5)


def test_lora_targets_attn_only():
    wan = _tiny_wan(lora_rank=RANK, lora_targets="attn")
    lat, t, ctx = _inputs(jax.random.PRNGKey(3))
    params = wan.init(jax.random.PRNGKey(0), lat, t, ctx)["params"]
    lora_tree, _ = split_lora_params(params)
    paths = {"/".join(k) for k in traverse_util.flatten_dict(lora_tree)}
    assert any("q_proj" in p for p in paths)
    assert not any("ffn" in p for p in paths)


def test_gradients_flow_only_into_lora_partition(lora_setup):
    wan, _, lora_tree, base, (lat, t, ctx) = lora_setup

    def loss(lora, frozen):
        out = wan.apply({"params": join_lora_params(lora, frozen)}, lat, t, ctx)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(lora_tree, base)
    flat = traverse_util.flatten_dict(g)
    assert flat.keys() == traverse_util.flatten_dict(lora_tree).keys()
    # at init B == 0: dL/dA == 0 but dL/dB != 0 (classic LoRA init property)
    gb = [v for k, v in flat.items() if k[-1] == "lora_B"]
    ga = [v for k, v in flat.items() if k[-1] == "lora_A"]
    assert max(float(jnp.max(jnp.abs(v))) for v in gb) > 0.0
    assert max(float(jnp.max(jnp.abs(v))) for v in ga) == 0.0
