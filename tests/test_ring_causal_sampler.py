"""Sequence-sharded causal Stage-2 (VERDICT-r4 stretch #8).

The causal sampler's full-buffer Stage-2 delta is its only O(T²) term; with
--seq_shard N it runs inside shard_map with T sharded over a 'seq' mesh axis
and attention as causal ring attention (parallel/ring.py), positions made
global via pos_frac. Parity contract: identical params ⇒ the sharded forward
matches the dense forward within fp tolerance, so trained checkpoints serve
long horizons unchanged (reference long-context analogue:
sample_generate_causal.py:503-583 chunked AR + SLA).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from interpolated_diffusion_tpu.models.denoisers import InterpLevelDenoiser
from interpolated_diffusion_tpu.parallel.ring import make_seq_mesh

B, T, D, C = 2, 512, 2, 2


def _model(attn_impl):
    return InterpLevelDenoiser(d_model=32, n_layers=2, n_heads=4, d_ff=64,
                               d_cond=16, data_dim=D, mask_channels=C,
                               causal=True, maze_channels=(4,),
                               attn_impl=attn_impl)


def test_seq_sharded_causal_denoiser_matches_dense():
    dense = _model("dense")
    cond = {"occ": jnp.zeros((B, 1, 8, 8)), "start_goal": jnp.zeros((B, 4))}
    params = dense.init(jax.random.PRNGKey(0), jnp.zeros((B, T, D)),
                        jnp.zeros((B,), jnp.int32), jnp.zeros((B, T, C)),
                        cond)["params"]
    # non-trivial function of the inputs (delta head is zero-init)
    params = jax.tree_util.tree_map(lambda p: p + 0.02, params)

    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    s = jnp.full((B,), 3, jnp.int32)
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (B, T, C)) > 0.8
            ).astype(jnp.float32)
    ref = dense.apply({"params": params}, x, s, mask, cond)

    mesh = make_seq_mesh(8)
    ring = dense.clone(attn_impl="ring")
    from interpolated_diffusion_tpu.sample.generate import hoist_cond_vec

    cv = hoist_cond_vec(dense, params, cond)["cond_vec"]
    pos = jnp.linspace(0.0, 1.0, T)

    def inner(p, x_loc, s_b, m_loc, cvec, pf):
        return ring.apply({"params": p}, x_loc, s_b, m_loc,
                          {"cond_vec": cvec}, pos_frac=pf)

    out = jax.jit(jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P(None, "seq", None), P(), P(None, "seq", None),
                  P(), P("seq")),
        out_specs=P(None, "seq", None),
    ))(params, x, s, mask, cv, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_causal_sampler_cli_seq_shard(tmp_path):
    """Drive the real CLI end-to-end at T=512 with --seq_shard 8: train
    2-step kp/il causal checkpoints, then sample one batch."""
    import subprocess
    import sys

    env = dict(__import__("os").environ, CPU_DEVICES="8",
               ID_TPU_NO_EVIDENCE="1")

    def run(mod, *extra):
        r = subprocess.run(
            [sys.executable, "scripts/cpu_run.py", mod, *extra],
            capture_output=True, text=True, timeout=1200, env=env,
            cwd="/root/repo")
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    common = ["--dataset", "particle", "--num_samples", "16", "--T", "512",
              "--batch", "4", "--steps", "2", "--save_every", "2"]
    run("interpolated_diffusion_tpu.train.train_keypoints", *common,
        "--K", "8", "--out_dir", str(tmp_path / "kp"))
    run("interpolated_diffusion_tpu.train.train_interp_levels", *common,
        "--K_min", "8", "--levels", "3", "--mode", "adj", "--causal", "1",
        "--out_dir", str(tmp_path / "il"))
    run("interpolated_diffusion_tpu.sample.generate_causal",
        "--kp_ckpt", str(tmp_path / "kp"), "--interp_ckpt", str(tmp_path / "il"),
        "--dataset", "particle", "--num_samples", "8",
        "--seq_shard", "8", "--chunk", "64", "--ddim_steps", "2",
        "--num_batches", "1", "--batch", "2",
        "--out_dir", str(tmp_path / "samples"))
    assert (tmp_path / "samples" / "summary.json").exists()
