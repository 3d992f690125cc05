"""SD AutoencoderKL flax port: shapes, conversion round-trip, contract.

Uses a tiny config (same topology, narrow channels) so CPU tests stay fast;
the mapping logic is channel-width-independent. Reference capability:
src/models/frame_vae.py:17 (frozen diffusers AutoencoderKL).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpolated_diffusion_tpu.models.sd_vae import (
    SDVAE, convert_sd_vae_state_dict, export_sd_vae_state_dict,
)

TINY = dict(block_out=(32, 32, 64, 64), layers_per_block=2, latent_channels=4)


def _init():
    model = SDVAE(**TINY)
    frames = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 3, 32, 32))
    params = model.init(jax.random.PRNGKey(1), frames)["params"]
    return model, params, frames


@pytest.mark.slow  # full SDVAE encode+decode build: ~20 s on 1 core
def test_shapes_and_scaling_contract():
    model, params, frames = _init()
    z = model.apply({"params": params}, frames, method=SDVAE.encode)
    assert z.shape == (1, 2, 4, 4, 4)          # 8x spatial downsample, 4ch
    x = model.apply({"params": params}, z, method=SDVAE.decode)
    assert x.shape == frames.shape
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0


def test_encode_stochastic_differs_from_mean():
    model, params, frames = _init()
    z_mean = model.apply({"params": params}, frames, method=SDVAE.encode)
    z_samp = model.apply({"params": params}, frames, jax.random.PRNGKey(2),
                         method=SDVAE.encode)
    assert not np.allclose(np.asarray(z_mean), np.asarray(z_samp))


def test_conversion_roundtrip_exact():
    _, params, _ = _init()
    params_np = jax.tree_util.tree_map(np.asarray, params)
    sd = export_sd_vae_state_dict(params_np)
    back = convert_sd_vae_state_dict(sd, block_out=TINY["block_out"],
                                     layers_per_block=TINY["layers_per_block"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params_np, back,
    )


def test_converted_params_apply():
    model, params, frames = _init()
    params_np = jax.tree_util.tree_map(np.asarray, params)
    sd = export_sd_vae_state_dict(params_np)
    conv = convert_sd_vae_state_dict(sd, block_out=TINY["block_out"],
                                     layers_per_block=TINY["layers_per_block"])
    y_ref, _ = model.apply({"params": params}, frames)
    y, _ = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, conv)},
                       frames)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)


def test_state_dict_names_are_diffusers_style():
    _, params, _ = _init()
    sd = export_sd_vae_state_dict(jax.tree_util.tree_map(np.asarray, params))
    for needed in (
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.down_blocks.2.resnets.0.conv_shortcut.weight",
        "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.mid_block.resnets.1.conv2.bias",
        "decoder.up_blocks.0.resnets.2.conv1.weight",
        "decoder.up_blocks.2.upsamplers.0.conv.weight",
        "quant_conv.weight",
        "post_quant_conv.bias",
    ):
        assert needed in sd, needed
    # torch conv layout [out, in, kh, kw]
    assert sd["encoder.conv_in.weight"].shape == (TINY["block_out"][0], 3, 3, 3)
    # attention projections exported as Linear [out, in]
    assert sd["encoder.mid_block.attentions.0.to_q.weight"].ndim == 2


def test_legacy_conv_attention_accepted():
    _, params, _ = _init()
    sd = export_sd_vae_state_dict(jax.tree_util.tree_map(np.asarray, params))
    # rewrite attention projections into the legacy 1x1-conv + old-name form
    legacy = {}
    for k, v in sd.items():
        m = k.replace(".to_q.", ".query.").replace(".to_k.", ".key.") \
             .replace(".to_v.", ".value.").replace(".to_out.0.", ".proj_attn.")
        if m != k and m.endswith(".weight"):
            v = v[:, :, None, None]
        legacy[m] = v
    back = convert_sd_vae_state_dict(legacy, block_out=TINY["block_out"],
                                     layers_per_block=TINY["layers_per_block"])
    ref = convert_sd_vae_state_dict(sd, block_out=TINY["block_out"],
                                    layers_per_block=TINY["layers_per_block"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ref, back,
    )
