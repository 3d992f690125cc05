"""Wan pretrained-weight conversion: mapping round-trip + model apply.

True numerical parity vs diffusers needs the real Wan2.1 weights (not
available in this environment); these tests pin the mapping itself — exact
round-trip through the inverse export, shape compatibility with WanDiT init
in both layer layouts, and the bf16 safetensors load path the real
checkpoint shards use. Reference capability: src/models/wan_backbone.py:21.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpolated_diffusion_tpu.models.wan_convert import (
    convert_wan_state_dict, export_wan_state_dict, load_wan_safetensors,
)
from interpolated_diffusion_tpu.models.wan_dit import WanDiT

CFG = dict(
    dim=48, n_layers=2, n_heads=4, ffn_dim=96, in_channels=4,
    out_channels=4, text_dim=32, max_seq_len=64, freq_dim=16,
)


def _init_loop():
    model = WanDiT(**CFG, layer_mode="loop")
    lat = jnp.zeros((1, 4, 2, 4, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 6, CFG["text_dim"]))
    params = model.init(jax.random.PRNGKey(0), lat, t, ctx)["params"]
    return model, jax.tree_util.tree_map(np.asarray, params), (lat, t, ctx)


def _trees_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b,
    )


@pytest.mark.slow  # full WanDiT init for the export: ~13 s on 1 core
def test_roundtrip_exact():
    _, params, _ = _init_loop()
    sd = export_wan_state_dict(params, patch_size=(1, 2, 2), in_channels=4)
    back = convert_wan_state_dict(sd, layer_mode="loop")
    _trees_equal(params, back)


def test_converted_params_apply_both_layouts():
    model, params, (lat, t, ctx) = _init_loop()
    sd = export_wan_state_dict(params, patch_size=(1, 2, 2), in_channels=4)
    y_ref = model.apply({"params": params}, lat, t, ctx)
    for mode in ("loop", "scan"):
        conv = convert_wan_state_dict(sd, layer_mode=mode)
        m = WanDiT(**CFG, layer_mode=mode)
        y = m.apply({"params": jax.tree_util.tree_map(jnp.asarray, conv)},
                    lat, t, ctx)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)


def test_state_dict_names_are_diffusers_style():
    _, params, _ = _init_loop()
    sd = export_wan_state_dict(params, patch_size=(1, 2, 2), in_channels=4)
    for needed in (
        "patch_embedding.weight",
        "condition_embedder.time_embedder.linear_1.weight",
        "condition_embedder.time_proj.bias",
        "condition_embedder.text_embedder.linear_2.weight",
        "blocks.0.attn1.to_q.weight",
        "blocks.0.attn1.norm_q.weight",
        "blocks.1.attn2.to_out.0.bias",
        "blocks.1.ffn.net.0.proj.weight",
        "blocks.1.ffn.net.2.bias",
        "blocks.0.scale_shift_table",
        "blocks.0.norm2.weight",
        "scale_shift_table",
        "proj_out.weight",
    ):
        assert needed in sd, needed
    # conv3d layout [dim, C, pt, ph, pw]
    assert sd["patch_embedding.weight"].shape == (CFG["dim"], 4, 1, 2, 2)
    # torch linear layout [out, in]
    assert sd["blocks.0.ffn.net.0.proj.weight"].shape == (CFG["ffn_dim"], CFG["dim"])


def test_bf16_safetensors_load(tmp_path):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    model, params, (lat, t, ctx) = _init_loop()
    sd = export_wan_state_dict(params, patch_size=(1, 2, 2), in_channels=4)
    sd_bf16 = {k: torch.from_numpy(np.ascontiguousarray(v)).bfloat16()
               for k, v in sd.items()}
    f = str(tmp_path / "model.safetensors")
    save_file(sd_bf16, f)

    conv = load_wan_safetensors(str(tmp_path), layer_mode="scan")
    m = WanDiT(**CFG, layer_mode="scan", dtype=jnp.bfloat16)
    y = m.apply({"params": jax.tree_util.tree_map(jnp.asarray, conv)},
                lat, t, ctx)
    y_ref = model.apply({"params": params}, lat, t, ctx)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(y_ref),
                               rtol=0.1, atol=0.1)


def test_i2v_weights_rejected_when_strict():
    _, params, _ = _init_loop()
    sd = export_wan_state_dict(params, patch_size=(1, 2, 2), in_channels=4)
    sd["blocks.0.attn2.add_k_proj.weight"] = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="I2V"):
        convert_wan_state_dict(sd, layer_mode="loop")
    out = convert_wan_state_dict(sd, layer_mode="loop", strict=False)
    assert "block_0" in out
