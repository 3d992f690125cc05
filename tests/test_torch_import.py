"""Reference-checkpoint migration: torch state_dict → flax params parity.

tests/golden/reference_models.npz holds state_dicts + forward outputs of the
reference denoisers (recorded by scripts/make_golden_reference.py). These
tests convert the state_dicts with models/torch_import.py, run the flax
modules on the same inputs, and require forward agreement — proving a user
can carry reference-trained checkpoints into this framework.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from interpolated_diffusion_tpu.models.denoisers import (
    InterpLevelDenoiser,
    KeypointDenoiser,
)
from interpolated_diffusion_tpu.models.torch_import import convert_state_dict

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "reference_models.npz")

KP_KW = dict(d_model=64, n_layers=2, n_heads=4, d_ff=128, d_cond=32,
             use_start_goal=True, data_dim=2, kp_feat_dim=3,
             maze_channels=(8, 16))
IT_KW = dict(d_model=64, n_layers=2, n_heads=4, d_ff=128, d_cond=32,
             use_start_goal=True, data_dim=2, max_levels=8, mask_channels=2,
             maze_channels=(8, 16))
T_M = 24


@pytest.fixture(scope="module")
def g():
    if not os.path.exists(GOLDEN):
        pytest.skip("model golden file missing (run scripts/make_golden_reference.py)")
    return np.load(GOLDEN)


def sd_of(g, prefix):
    p = f"{prefix}/sd/"
    return {k[len(p):]: g[k] for k in g.files if k.startswith(p)}


def test_keypoint_denoiser_import(g):
    params = convert_state_dict(sd_of(g, "kp"), "keypoint")
    model = KeypointDenoiser(**KP_KW)
    eps = model.apply(
        {"params": params},
        jnp.asarray(g["kp/in/z_t"]), jnp.asarray(g["kp/in/t"]),
        jnp.asarray(g["kp/in/idx"]), jnp.asarray(g["kp/in/known"]),
        {"occ": jnp.asarray(g["kp/in/occ"]),
         "start_goal": jnp.asarray(g["kp/in/start_goal"]),
         "kp_feat": jnp.asarray(g["kp/in/kp_feat"])},
        T_M,
    )
    np.testing.assert_allclose(np.asarray(eps), g["kp/out"], atol=2e-5, rtol=1e-4)


def test_interp_denoiser_import(g):
    params = convert_state_dict(sd_of(g, "it"), "interp")
    model = InterpLevelDenoiser(**IT_KW)
    out = model.apply(
        {"params": params},
        jnp.asarray(g["it/in/x_s"]), jnp.asarray(g["it/in/s"]),
        jnp.asarray(g["it/in/mask"]),
        {"occ": jnp.asarray(g["kp/in/occ"]),
         "start_goal": jnp.asarray(g["kp/in/start_goal"])},
    )
    np.testing.assert_allclose(np.asarray(out), g["it/out"], atol=2e-5, rtol=1e-4)


def test_causal_interp_denoiser_import(g):
    params = convert_state_dict(sd_of(g, "itc"), "interp_causal")
    model = InterpLevelDenoiser(**{**IT_KW, "mask_channels": 1, "causal": True})
    out = model.apply(
        {"params": params},
        jnp.asarray(g["it/in/x_s"]), jnp.asarray(g["it/in/s"]),
        jnp.asarray(g["itc/in/mask"]),
        {"occ": jnp.asarray(g["kp/in/occ"]),
         "start_goal": jnp.asarray(g["kp/in/start_goal"])},
    )
    np.testing.assert_allclose(np.asarray(out), g["itc/out"], atol=2e-5, rtol=1e-4)


@pytest.mark.slow  # fresh init of every model family: ~11 s on 1 core
def test_converted_tree_matches_init_shapes(g):
    """Converted pytree is structurally identical to a fresh init (so it can
    be dropped into trainers/samplers/checkpoints unchanged)."""
    import jax

    params = convert_state_dict(sd_of(g, "kp"), "keypoint")
    model = KeypointDenoiser(**KP_KW)
    ref = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(g["kp/in/z_t"][:1]), jnp.asarray(g["kp/in/t"][:1]),
        jnp.asarray(g["kp/in/idx"][:1]), jnp.asarray(g["kp/in/known"][:1]),
        {"occ": jnp.asarray(g["kp/in/occ"][:1]),
         "start_goal": jnp.asarray(g["kp/in/start_goal"][:1]),
         "kp_feat": jnp.asarray(g["kp/in/kp_feat"][:1])},
        T_M,
    )["params"]
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes)
    assert jax.tree.leaves(ref_shapes) == jax.tree.leaves(got_shapes)


def test_load_reference_pt_checkpoint(g, tmp_path):
    """Full route: reference-style .pt payload on disk → load_keypoint_model
    → forward parity (what a migrating user actually does)."""
    torch = pytest.importorskip("torch")
    sd = {k: torch.from_numpy(np.array(v)) for k, v in sd_of(g, "kp").items()}
    meta = {
        "stage": "keypoints", "T": T_M, "K": 6, "data_dim": 2,
        "N_train": 100, "schedule": "linear", "use_sdf": False,
        "cond_start_goal": True, "clamp_endpoints": True,
        "use_kp_feat": True, "kp_feat_dim": 3,
        "kp_d_model": 64, "kp_n_layers": 2, "kp_n_heads": 4,
        "kp_d_ff": 128, "kp_d_cond": 32, "kp_maze_channels": "8,16",
    }
    path = str(tmp_path / "ckpt_100.pt")
    torch.save({"model": sd, "step": 100, "meta": meta}, path)

    from interpolated_diffusion_tpu.models.loading import load_keypoint_model

    model, params, norm = load_keypoint_model(path, bf16=False)
    eps = model.apply(
        {"params": params},
        jnp.asarray(g["kp/in/z_t"]), jnp.asarray(g["kp/in/t"]),
        jnp.asarray(g["kp/in/idx"]), jnp.asarray(g["kp/in/known"]),
        {"occ": jnp.asarray(g["kp/in/occ"]),
         "start_goal": jnp.asarray(g["kp/in/start_goal"]),
         "kp_feat": jnp.asarray(g["kp/in/kp_feat"])},
        T_M,
    )
    np.testing.assert_allclose(np.asarray(eps), g["kp/out"], atol=2e-5, rtol=1e-4)
    assert norm["d_model"] == 64 and norm["maze_channels"] == "8,16"


SEL_KW = dict(T=T_M, d_model=32, n_heads=4, d_ff=64, n_layers=2, pos_dim=16,
              use_sdf=False, use_start_goal=True, use_sg_map=True,
              use_sg_token=True, use_goal_dist_token=True, use_cond_bias=True,
              cond_bias_mode="memory", use_level=True, sg_map_sigma=1.5,
              maze_channels=(8, 16))


def test_keypoint_selector_import(g):
    from interpolated_diffusion_tpu.models.selector import KeypointSelector
    from interpolated_diffusion_tpu.models.torch_import import convert_keypoint_selector

    params = convert_keypoint_selector(sd_of(g, "sel"), n_heads=4)
    model = KeypointSelector(**SEL_KW)
    logits = model.apply(
        {"params": params},
        {"occ": jnp.asarray(g["kp/in/occ"]),
         "start_goal": jnp.asarray(g["kp/in/start_goal"]),
         "level": jnp.asarray(g["sel/in/level"])},
    )
    np.testing.assert_allclose(np.asarray(logits), g["sel/out"], atol=3e-5, rtol=1e-4)


def test_segment_cost_import(g):
    from interpolated_diffusion_tpu.models.selector import SegmentCostPredictor
    from interpolated_diffusion_tpu.models.torch_import import convert_segment_cost

    params = convert_segment_cost(sd_of(g, "dphi"))
    model = SegmentCostPredictor(d_cond=32, seg_feat_dim=3, hidden_dim=48,
                                 n_layers=3, use_sdf=False, use_start_goal=True,
                                 maze_channels=(8, 16))
    cost = model.apply(
        {"params": params},
        {"occ": jnp.asarray(g["kp/in/occ"]),
         "start_goal": jnp.asarray(g["kp/in/start_goal"])},
        jnp.asarray(g["dphi/in/seg_feat"]),
    )
    np.testing.assert_allclose(np.asarray(cost), g["dphi/out"], atol=3e-5, rtol=1e-4)


def test_import_cli_roundtrip(g, tmp_path):
    """scripts/import_reference_ckpt.py: .pt → native checkpoint dir →
    load_keypoint_model (no torch at load time) → forward parity."""
    torch = pytest.importorskip("torch")
    import scripts.import_reference_ckpt as cli

    sd = {k: torch.from_numpy(np.array(v)) for k, v in sd_of(g, "kp").items()}
    meta = {"stage": "keypoints", "T": T_M, "K": 6, "data_dim": 2,
            "N_train": 100, "schedule": "linear", "use_sdf": False,
            "cond_start_goal": True, "use_kp_feat": True, "kp_feat_dim": 3,
            "kp_d_model": 64, "kp_n_layers": 2, "kp_n_heads": 4,
            "kp_d_ff": 128, "kp_d_cond": 32, "kp_maze_channels": "8,16"}
    src = str(tmp_path / "ref.pt")
    out = str(tmp_path / "imported")
    torch.save({"model": sd, "step": 5, "meta": meta}, src)
    cli.main(["--src", src, "--kind", "keypoint", "--out", out,
              "--maze_h", "11", "--maze_w", "11"])

    from interpolated_diffusion_tpu.models.loading import load_keypoint_model

    model, params, _ = load_keypoint_model(out, bf16=False)
    eps = model.apply(
        {"params": params},
        jnp.asarray(g["kp/in/z_t"]), jnp.asarray(g["kp/in/t"]),
        jnp.asarray(g["kp/in/idx"]), jnp.asarray(g["kp/in/known"]),
        {"occ": jnp.asarray(g["kp/in/occ"]),
         "start_goal": jnp.asarray(g["kp/in/start_goal"]),
         "kp_feat": jnp.asarray(g["kp/in/kp_feat"])},
        T_M,
    )
    np.testing.assert_allclose(np.asarray(eps), g["kp/out"], atol=2e-5, rtol=1e-4)


def test_video_keypoint_denoiser_import(g):
    from interpolated_diffusion_tpu.models.video_denoisers import VideoTokenKeypointDenoiser
    from interpolated_diffusion_tpu.models.torch_import import convert_video_keypoint_denoiser

    params = convert_video_keypoint_denoiser(sd_of(g, "vk"))
    model = VideoTokenKeypointDenoiser(d_model=48, n_layers=2, n_heads=4,
                                       d_ff=96, d_cond=24, data_dim=20)
    out = model.apply(
        {"params": params},
        jnp.asarray(g["vk/in/z"]), jnp.asarray(g["vk/in/t"]),
        jnp.asarray(g["vk/in/idx"]), {"text_embed": jnp.asarray(g["vk/in/text"])},
        10, (2, 3),
    )
    np.testing.assert_allclose(np.asarray(out), g["vk/out"], atol=3e-5, rtol=1e-4)


def test_video_interp_denoiser_import(g):
    from interpolated_diffusion_tpu.models.video_denoisers import VideoTokenInterpLevelDenoiser
    from interpolated_diffusion_tpu.models.torch_import import convert_video_interp_denoiser

    params = convert_video_interp_denoiser(sd_of(g, "vi"))
    model = VideoTokenInterpLevelDenoiser(d_model=48, n_layers=2, n_heads=4,
                                          d_ff=96, d_cond=24, data_dim=20,
                                          mask_channels=2, max_levels=8)
    out = model.apply(
        {"params": params},
        jnp.asarray(g["vi/in/x"]), jnp.asarray(g["vi/in/s"]),
        jnp.asarray(g["vi/in/mask"]), {"text_embed": jnp.asarray(g["vk/in/text"])},
        (2, 3),
    )
    np.testing.assert_allclose(np.asarray(out), g["vi/out"], atol=3e-5, rtol=1e-4)


def test_tiny_interpolator_import(g):
    from interpolated_diffusion_tpu.models.interpolators import TinyTemporalInterpolator
    from interpolated_diffusion_tpu.models.torch_import import (
        convert_tiny_temporal_interpolator,
    )

    params = convert_tiny_temporal_interpolator(sd_of(g, "ti"))
    model = TinyTemporalInterpolator(data_dim=12, kernel_size=3, n_layers=2)
    out = model.apply({"params": params}, jnp.asarray(g["ti/in/z"]))
    np.testing.assert_allclose(np.asarray(out), g["ti/out"], atol=2e-5, rtol=1e-4)


def test_load_pt_with_list_ema_and_causal_stage(g, tmp_path):
    """Reference checkpoints store EMA shadow as a LIST in parameters()
    order (ema.py:9,:28) and the causal trainer stamps
    stage='interp_levels_causal' — both must load end to end."""
    torch = pytest.importorskip("torch")
    sd = {k: torch.from_numpy(np.array(v)) for k, v in sd_of(g, "itc").items()}
    # EMA shadow = scaled copies, list-form, state-dict order
    shadow = [v.clone() * 0.5 for v in sd.values()]
    meta = {"stage": "interp_levels_causal", "T": T_M, "K_min": 6, "levels": 3,
            "data_dim": 2, "use_sdf": False, "cond_start_goal": True,
            "stage2_mode": "x0", "mask_channels": 1, "k_schedule": "doubling",
            "s2_d_model": 64, "s2_n_layers": 2, "s2_n_heads": 4,
            "s2_d_ff": 128, "s2_d_cond": 32, "s2_maze_channels": "8,16"}
    path = str(tmp_path / "ckpt_causal.pt")
    torch.save({"model": sd, "step": 7, "meta": meta,
                "ema": {"decay": 0.999, "shadow": shadow}}, path)

    from interpolated_diffusion_tpu.models.loading import load_interp_model

    model, params, norm = load_interp_model(path, bf16=False, use_ema=True)
    assert model.causal and norm["mode"] == "x0" and norm["causal"]
    # EMA applied: transformer qkv kernel is half the raw weight
    raw = np.array(g["itc/sd/transformer.layers.0.attn.in_proj_weight"]).T
    got = np.asarray(params["transformer"]["block_0"]["qkv"]["kernel"])
    np.testing.assert_allclose(got, raw * 0.5, atol=1e-6)

    # raw load (use_ema=False) keeps the un-averaged weights
    _, params_raw, _ = load_interp_model(path, bf16=False, use_ema=False)
    np.testing.assert_allclose(
        np.asarray(params_raw["transformer"]["block_0"]["qkv"]["kernel"]),
        raw, atol=1e-6)
