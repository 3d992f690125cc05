"""Regression tests for the round-2 D4RL T=128 divergence.

Three independent failure modes are pinned down (see runs/d4rl_r2 postmortem
in docs/RESULTS.md):
  1. Stage-2 corruption targets at T=128/D=4 must stay bounded — the round-2
     run trained on velocity targets recomputed as finite-diff × T from a
     prep that stored O(0.2) observation velocities (13× apart), on top of
     unclipped anchor explosions.
  2. The DDIM x0-from-eps divide at the cosine-1000 terminal step (√ᾱ≈5e-5)
     amplifies model error ~2e4×; x0_clip must bound the iterate.
  3. A tiny Stage-2 training at the failing configuration (T=128, D=4,
     levels=8, geom) must produce a model whose refinement does not worsen
     oracle-anchor interpolations (the VERDICT round-3 gate test).
"""
import os

import numpy as np
import pytest


def _synth_prepared(path=None, N=256, T=128, h=9, w=9, seed=0):
    """Smooth 2D trajectories + fd-convention velocities on an open grid.

    path=None returns the array without writing anywhere (no stray files
    outside pytest tmp dirs, no cross-run races on a shared path)."""
    rng = np.random.RandomState(seed)
    t = np.linspace(0.0, 1.0, T)[None, :]
    a = rng.uniform(0.15, 0.35, (N, 1))
    ph = rng.uniform(0, 2 * np.pi, (N, 1))
    fr = rng.uniform(0.5, 1.2, (N, 1))  # fd velocity ≤ a·2πf ≈ 2.6
    x = 0.5 + a * np.cos(2 * np.pi * fr * t + ph)
    y = 0.5 + a * np.sin(2 * np.pi * fr * t + ph)
    pos = np.clip(np.stack([x, y], axis=-1), 0.02, 0.98).astype(np.float32)
    vel = np.zeros_like(pos)
    vel[:, :-1] = (pos[:, 1:] - pos[:, :-1]) * float(T)
    xout = np.concatenate([pos, vel], axis=-1)
    occ = np.zeros((N, 1, h, w), np.float32)
    occ[:, :, 0, :] = occ[:, :, -1, :] = occ[:, :, :, 0] = occ[:, :, :, -1] = 1.0
    sg = np.concatenate([pos[:, 0], pos[:, -1]], axis=-1)
    if path is not None:
        np.savez_compressed(path, x=xout, occ=occ, start_goal=sg)
    return xout


@pytest.mark.slow  # T=128 D=4 batch builders: ~18 s on 1 core
def test_stage2_targets_bounded_t128_d4():
    """Adjacent-level targets stay O(1) in every channel at the failing
    config (T=128, D=4, levels=8, geom, dist corruption σ∈[0.003, 0.02])."""
    import jax
    import jax.numpy as jnp

    from interpolated_diffusion_tpu.ops.keyframes import (
        build_nested_masks_from_base,
        sample_fixed_k_indices_uniform_batch,
    )
    from interpolated_diffusion_tpu.train.batches import (
        build_interp_adjacent_batch,
    )

    x0 = jnp.asarray(_synth_prepared(N=32))
    B, T, D = x0.shape
    key = jax.random.PRNGKey(0)
    idx, _ = sample_fixed_k_indices_uniform_batch(key, B, T, 8)
    masks_levels, idx_levels = build_nested_masks_from_base(
        key, idx, T, 8, k_schedule="geom")
    x_s, x_prev, *_ = build_interp_adjacent_batch(
        key, x0, 8, 8, recompute_velocity=True,
        masks_levels=masks_levels, idx_levels=idx_levels,
        corrupt_mode="dist", corrupt_sigma_max=0.02, corrupt_sigma_min=0.003,
        corrupt_sigma_pow=0.75, corrupt_anchor_frac=0.25,
        clamp_endpoints=True, pos_clip=True,
    )
    target = x_prev - x_s
    # positions live in [0,1]; fd velocities of smooth paths are O(1); two
    # adjacent independently-noised positions can differ by ~6σ → ×T ≈ 15 in
    # a velocity channel — anything past ~20 means a convention/explosion
    # regression (the round-2 bug produced absmax ≥ hundreds)
    assert float(jnp.abs(x_s).max()) < 20.0
    assert float(jnp.abs(target).max()) < 20.0
    # level-to-level velocity deltas on these fast synthetic paths are O(1);
    # the round-2 convention-mismatch regression produced RMS an order of
    # magnitude past this
    assert float(jnp.sqrt((target ** 2).mean())) < 2.0


def test_ddim_x0_clip_bounds_cosine_terminal_amplification():
    """cosine-1000 + quadratic-20 DDIM with a slightly-wrong eps model:
    unclipped iterates explode through the √ᾱ≈5e-5 divide; x0_clip (all
    dims) and the pos-dims post clip keep their channels bounded."""
    import jax
    import jax.numpy as jnp

    from interpolated_diffusion_tpu.ops.ddpm import make_timesteps, run_solver
    from interpolated_diffusion_tpu.ops.schedules import make_schedule

    sched = make_schedule("cosine", 1000)
    times = jnp.asarray(make_timesteps(1000, 20, "quadratic"))
    B, K, D = 4, 8, 4
    z = jax.random.normal(jax.random.PRNGKey(0), (B, K, D))

    def eps_fn(z, t_b, **kw):
        return 0.97 * z  # 3% systematic error vs the pure-noise identity

    z_bad, _ = run_solver("ddim", eps_fn, z, times, sched)
    assert float(jnp.abs(z_bad).max()) > 50.0  # documents the failure mode

    z_clip, _ = run_solver("ddim", eps_fn, z, times, sched, x0_clip=4.0)
    assert float(jnp.abs(z_clip).max()) < 8.0

    def post(zz):  # the sampler/bootstrap pos-clip (positions only)
        return zz.at[..., :2].set(jnp.clip(zz[..., :2], 0.0, 1.0))

    z_pos, _ = run_solver("ddim", eps_fn, z, times, sched, post=post,
                          x0_clip=4.0)
    assert float(jnp.abs(z_pos[..., :2]).max()) <= 1.0
    assert float(jnp.abs(z_pos[..., 2:]).max()) < 8.0


@pytest.mark.slow
def test_stage2_oracle_refined_not_worse_t128_d4(tmp_path):
    """Train tiny Stage-1+Stage-2 at the exact failing configuration
    (T=128, D=4, levels=8, geom, dist noise, bootstrap ON) and assert the
    full sampler's oracle-anchor refinement does not blow up the
    interpolation — the round-2 run had oracle refined MSE 107 vs interp
    0.09. Also exercises the sanity gate wiring end-to-end."""
    from interpolated_diffusion_tpu.sample.generate import main as gen_main
    from interpolated_diffusion_tpu.train.train_interp_levels import (
        main as il_main,
    )
    from interpolated_diffusion_tpu.train.train_keypoints import (
        main as kp_main,
    )

    prep = str(tmp_path / "prep.npz")
    _synth_prepared(prep, N=256)
    tiny = [
        "--dataset", "prepared", "--prepared_path", prep,
        "--T", "128", "--batch", "32", "--with_velocity", "1",
        "--d_model", "48", "--n_layers", "2", "--n_heads", "2",
        "--d_ff", "96", "--maze_channels", "8,8",
        "--maze_h", "9", "--maze_w", "9",
        "--log_every", "50", "--bf16", "0", "--steps_per_call", "5",
    ]
    kp_out = str(tmp_path / "kp")
    kp_main(tiny + ["--K", "8", "--schedule", "cosine", "--N_train", "1000",
                    "--steps", "60", "--save_every", "60",
                    "--out_dir", kp_out])
    il_out = str(tmp_path / "il")
    il_main(tiny + [
        "--K_min", "8", "--levels", "8", "--k_schedule", "geom",
        "--mode", "adj", "--mask_policy", "uniform",
        "--anchor_conf", "1", "--anchor_conf_anneal", "1", "--w_anchor", "0.1",
        "--corrupt_mode", "dist", "--corrupt_sigma_max", "0.02",
        "--corrupt_sigma_min", "0.003", "--corrupt_sigma_pow", "0.75",
        "--corrupt_anchor_frac", "0.25", "--pos_clip", "1",
        "--bootstrap_ckpt", kp_out, "--bootstrap_ddim_steps", "4",
        "--bootstrap_warmup_steps", "100",
        "--steps", "300", "--save_every", "300", "--out_dir", il_out,
    ])
    out = str(tmp_path / "samples")
    summary = gen_main([
        "--kp_ckpt", kp_out, "--interp_ckpt", il_out,
        "--dataset", "prepared", "--prepared_path", prep,
        "--maze_h", "9", "--maze_w", "9",
        "--with_velocity", "1",
        "--kp_index_mode", "uniform", "--compare_oracle", "1",
        "--s2_noise_mode", "level", "--s2_noise_sigma", "0.003",
        "--pos_clip", "1", "--num_batches", "1", "--batch", "32",
        "--ddim_steps", "8", "--bf16", "0", "--sanity", "0",
        "--save_npz", "0", "--out_dir", out,
    ])
    oi = summary["oracle_interp_mse_to_gt"]
    orf = summary["oracle_refined_mse_to_gt"]
    # Catastrophe gate, not a quality gate: the round-2 regression had
    # orf = 107 vs oi = 0.09 (1000×) and refined collision 0.976. A
    # 300-step tiny model's deltas are still directionally uninformative
    # (measured cos≈0 vs true level deltas), so sequential application can
    # lawfully drift a few× above oi — the EMA-attenuated zero-init head
    # bounds that drift. Anything near O(1) MSE or majority-collision means
    # a pipeline defect recurred.
    assert oi < 0.5, oi
    assert orf < 0.5, (oi, orf)
    assert summary["oracle_refined_collision_rate"] < 0.5


def test_s2_noise_schedule_resolves_from_interp_meta():
    """Unset sampling-noise knobs default to the TRAINING corruption
    schedule in the interp checkpoint meta (reference
    sample_generate.py:646-659 semantics); explicit CLI values win."""
    from interpolated_diffusion_tpu.sample.generate import (
        resolve_s2_noise_schedule,
    )

    meta = {"corrupt_sigma_max": 0.02, "corrupt_sigma_min": 0.003,
            "corrupt_sigma_pow": 0.75}
    r = resolve_s2_noise_schedule("level", None, None, None, meta)
    assert r == {"s2_noise_sigma": 0.02, "s2_sigma_min": 0.003,
                 "s2_sigma_pow": 0.75}
    # explicit values override the meta
    r = resolve_s2_noise_schedule("level", 0.003, 0.0, 1.0, meta)
    assert r == {"s2_noise_sigma": 0.003, "s2_sigma_min": 0.0,
                 "s2_sigma_pow": 1.0}
    # non-level modes never inherit sigma_max from the meta
    r = resolve_s2_noise_schedule("none", None, None, None, meta)
    assert r["s2_noise_sigma"] == 0.0
    # constant mode uses the explicit sigma as-is
    r = resolve_s2_noise_schedule("constant", 0.01, None, None, meta)
    assert r["s2_noise_sigma"] == 0.01
