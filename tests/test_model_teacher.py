"""ModelTeacher: a trained in-repo interpolator checkpoint as the
distillation teacher (the reference's external-LDMVFI slot,
src/teachers/ldmvfi_teacher.py:48-127, filled without the external repo)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# full flow/sinkhorn interpolator builds + teacher sampling: ~40 s on a
# 1-core host — slow tier (the fast-tier contract is < 5 min total)
pytestmark = pytest.mark.slow

from interpolated_diffusion_tpu.utils.checkpoint import save_checkpoint

C, H, W = 4, 8, 8


def _save_flow_ckpt(out_dir):
    from interpolated_diffusion_tpu.models.flow_interpolator import (
        LatentFlowInterpolator,
    )

    model = LatentFlowInterpolator(
        in_channels=C, base_channels=8, max_flow=4.0, residual_blocks=1,
        time_mask=True, gap_cond=True, use_cost_volume=False, cv_radius=2,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, C, H, W)),
        jnp.asarray([[0, 2]], jnp.int32),
    )["params"]
    meta = {"stage": "flow_interpolator", "in_channels": C,
            "base_channels": 8, "max_flow": 4.0, "residual_blocks": 1,
            "time_mask": 1, "gap_cond": 1, "cost_volume": 0, "cv_radius": 2}
    os.makedirs(out_dir, exist_ok=True)
    save_checkpoint(os.path.join(out_dir, "ckpt_1"), params, None, 1, None, meta)
    return out_dir


def test_model_teacher_interpolates(tmp_path):
    from interpolated_diffusion_tpu.teachers.teacher import ModelTeacher

    teacher = ModelTeacher(_save_flow_ckpt(str(tmp_path / "flow")))
    rng = np.random.RandomState(0)
    z0 = rng.randn(C, H, W).astype(np.float32)
    z1 = rng.randn(C, H, W).astype(np.float32)
    mid = teacher.interpolate(z0, z1)
    assert mid.shape == (C, H, W) and np.isfinite(mid).all()
    # batched path
    midb = teacher.interpolate(np.stack([z0, z0]), np.stack([z1, z1]))
    assert midb.shape == (2, C, H, W)
    np.testing.assert_allclose(midb[0], midb[1], rtol=1e-6)
    np.testing.assert_allclose(midb[0], mid, rtol=1e-5, atol=1e-6)


def test_model_teacher_in_precompute_pipeline(tmp_path):
    from interpolated_diffusion_tpu.data.wan_synth import (
        SyntheticWanDataset, WanSynthTarDataset, write_tar_shard,
    )
    from interpolated_diffusion_tpu.teachers.teacher import (
        ModelTeacher, precompute_teacher_shards,
    )

    ds = SyntheticWanDataset(n_samples=3, T=5, C=C, H=H, W=W, text_len=2,
                             text_dim=4)
    data_root = str(tmp_path / "data")
    write_tar_shard(os.path.join(data_root, "shard_00000.tar"),
                    [{"__key__": f"{i:04d}", **ds.get(i)} for i in range(3)])
    teacher = ModelTeacher(_save_flow_ckpt(str(tmp_path / "flow")))
    out_root = str(tmp_path / "teacher")
    n = precompute_teacher_shards(data_root, out_root, T=5, teacher=teacher)
    assert n == 3
    joined = WanSynthTarDataset(data_root, T=5, shuffle_shards=False,
                                shuffle_buffer=1, teacher_root=out_root,
                                process_split=False)
    sample = next(iter(joined))
    assert sample["teacher_latents"].shape[1:] == (C, H, W)
    assert np.isfinite(sample["teacher_latents"]).all()


def test_model_teacher_sinkhorn_branch(tmp_path):
    from interpolated_diffusion_tpu.models.sinkhorn_warp import (
        SinkhornWarpInterpolator,
    )
    from interpolated_diffusion_tpu.teachers.teacher import ModelTeacher

    model = SinkhornWarpInterpolator(
        in_channels=C, patch_size=2, win_size=4, global_mode="none",
        sinkhorn_iters=3, learn_tau=True, learn_dustbin=True,
        fb_sigma=1.0, d_match=8,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, C, H, W)),
        jnp.asarray([[0, 2]], jnp.int32),
    )["params"]
    meta = {"stage": "sinkhorn_interp", "in_channels": C, "patch_size": 2,
            "win_size": 4, "sinkhorn_iters": 3, "global_mode": "none",
            "learn_tau": 1, "learn_dustbin": 1, "fb_sigma": 1.0, "d_match": 8}
    out = str(tmp_path / "sink")
    os.makedirs(out, exist_ok=True)
    save_checkpoint(os.path.join(out, "ckpt_1"), params, None, 1, None, meta)

    teacher = ModelTeacher(out)
    rng = np.random.RandomState(1)
    mid = teacher.interpolate(rng.randn(C, H, W).astype(np.float32),
                              rng.randn(C, H, W).astype(np.float32))
    assert mid.shape == (C, H, W) and np.isfinite(mid).all()


def test_model_teacher_rejects_non_interpolator(tmp_path):
    import pytest

    from interpolated_diffusion_tpu.teachers.teacher import ModelTeacher

    out = tmp_path / "bad"
    os.makedirs(out, exist_ok=True)
    save_checkpoint(str(out / "ckpt_1"), {"w": jnp.zeros((2,))}, None, 1,
                    None, {"stage": "straightener", "in_channels": C})
    with pytest.raises(ValueError, match="not an interpolator"):
        ModelTeacher(str(out))
