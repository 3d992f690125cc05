"""End-to-end toy-video generation: keypoints → interp → Stage-2 refinement.

Parity with reference src/sample/sample_toy_video.py: conditions on the GT
first/last frames, DDIM-samples K anchor frames, interpolates (linear or
smooth), runs the Stage-2 level loop, and reports MSE vs GT for the
oracle-anchor / predicted-anchor / refined variants plus the pure-LERP
baseline; decoded RGB panels land in samples.npz.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.toy_video import MovingShapesVideoDataset, decode_latents
from ..models.denoisers import InterpLevelDenoiser, KeypointDenoiser
from ..ops.ddpm import make_timesteps
from ..ops.keyframes import (
    build_nested_masks_from_base,
    interpolate_from_indices,
    sample_fixed_k_indices_uniform_batch,
)
from ..ops.schedules import make_schedule
from ..utils.checkpoint import read_meta, load_checkpoint
from ..models.loading import resolve_ckpt


def _load_toy(path: str, cls, bf16: bool, use_ema: bool, stage: str):
    path = resolve_ckpt(path)
    _, meta = read_meta(path)
    if meta.get("stage") != stage:
        raise ValueError(f"{path} is not a {stage} checkpoint")
    data_dim = int(meta["data_dim"])
    if cls is KeypointDenoiser:
        model = KeypointDenoiser(
            d_model=meta["d_model"], n_layers=meta["n_layers"],
            n_heads=meta["n_heads"], d_ff=meta["d_ff"], data_dim=data_dim,
            use_start_goal=False, dtype=jnp.bfloat16 if bf16 else jnp.float32,
        )
        tmpl = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, meta["K"], data_dim)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, meta["K"]), jnp.int32),
            jnp.zeros((1, meta["K"], data_dim), bool), {}, meta["T"],
        )["params"]
    else:
        mc = int(meta["mask_channels"])
        model = InterpLevelDenoiser(
            d_model=meta["d_model"], n_layers=meta["n_layers"],
            n_heads=meta["n_heads"], d_ff=meta["d_ff"], data_dim=data_dim,
            use_start_goal=False, max_levels=max(8, int(meta["levels"])),
            mask_channels=mc, dtype=jnp.bfloat16 if bf16 else jnp.float32,
        )
        tmpl = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, meta["T"], data_dim)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, meta["T"], mc)) if mc > 1 else jnp.zeros((1, meta["T"]), bool),
            {},
        )["params"]
    _, payload = load_checkpoint(path, tmpl)
    params = payload.get("ema") if (use_ema and "ema" in payload) else payload["params"]
    return model, params, meta


def build_argparser():
    p = argparse.ArgumentParser("sample_toy_video (TPU)")
    p.add_argument("--kp_ckpt", type=str, required=True)
    p.add_argument("--interp_ckpt", type=str, required=True)
    p.add_argument("--use_ema", type=int, default=1)
    p.add_argument("--num_batches", type=int, default=2)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--ddim_steps", type=int, default=20)
    p.add_argument("--solver", type=str, default="ddim",
                   choices=["ddim", "pfdiff", "dpm"],
                   help="pfdiff: ~half the Stage-1 model evals; dpm: "
                        "DPM-Solver++(2M) 2nd-order accuracy per eval")
    p.add_argument("--num_samples", type=int, default=1000)
    p.add_argument("--sample_seed", type=int, default=1234)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--decode_panels", type=int, default=1)
    p.add_argument("--out_dir", type=str, default="runs/samples_toy_video")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    kp_model, kp_params, kp_meta = _load_toy(
        args.kp_ckpt, KeypointDenoiser, bool(args.bf16), bool(args.use_ema),
        "keypoints_toy_video")
    il_model, il_params, il_meta = _load_toy(
        args.interp_ckpt, InterpLevelDenoiser, bool(args.bf16), bool(args.use_ema),
        "interp_levels_toy_video")
    T, K = int(kp_meta["T"]), int(kp_meta["K"])
    levels, K_min = int(il_meta["levels"]), int(il_meta["K_min"])
    data_dim = int(kp_meta["data_dim"])
    anchor_conf = bool(il_meta.get("anchor_conf", 0))
    mode = il_meta.get("mode", "adj")
    schedule = make_schedule(kp_meta["schedule"], int(kp_meta["N_train"]))
    times = jnp.asarray(make_timesteps(schedule.n_timesteps, args.ddim_steps, "linear"))

    def stage1(key, idx, x0):
        B = idx.shape[0]
        ends = ((idx == 0) | (idx == T - 1))[..., None]
        known_mask = jnp.broadcast_to(ends, (B, K, data_dim))
        z_gt = jnp.take_along_axis(x0, idx[..., None], axis=1)
        known_values = jnp.where(known_mask, z_gt, 0.0)
        z = jax.random.normal(key, (B, K, data_dim))
        z = jnp.where(known_mask, known_values, z)

        def eps_fn(z, t_b):
            return kp_model.apply({"params": kp_params}, z, t_b, idx,
                                  known_mask, {}, T)

        post = lambda z: jnp.where(known_mask, known_values, z)
        from ..ops.ddpm import run_solver

        z, _ = run_solver(args.solver, eps_fn, z, times, schedule, post=post)
        return z

    def stage2(key, x, idx):
        B = idx.shape[0]
        masks_levels, _ = build_nested_masks_from_base(key, idx, T, levels)
        s_iter = [levels] if mode == "x0" else list(range(levels, 0, -1))
        for s in s_iter:
            mask_s = masks_levels[:, s]
            chans = [mask_s.astype(jnp.float32)]
            if mode == "adj":
                chans.append(masks_levels[:, s - 1].astype(jnp.float32))
            if anchor_conf:
                conf = jnp.where(mask_s, 0.95, 0.0)
                conf = conf.at[:, 0].set(1.0).at[:, -1].set(1.0)
                chans.append(conf)
            mask_in = jnp.stack(chans, axis=-1) if len(chans) > 1 else mask_s
            s_level = jnp.full((B,), s, dtype=jnp.int32)
            x = x + il_model.apply({"params": il_params}, x, s_level, mask_in, {})
        return x

    @jax.jit
    def pipeline(key, x0):
        B = x0.shape[0]
        k_idx, k_s1, k_s2 = jax.random.split(key, 3)
        idx, _ = sample_fixed_k_indices_uniform_batch(k_idx, B, T, K, jitter=0.0)
        z_pred = stage1(k_s1, idx, x0)
        z_oracle = jnp.take_along_axis(x0, idx[..., None], axis=1)
        x_interp = interpolate_from_indices(idx, z_pred, T)
        x_oracle_interp = interpolate_from_indices(idx, z_oracle, T)
        x_refined = stage2(k_s2, x_interp, idx)
        x_oracle_refined = stage2(k_s2, x_oracle_interp, idx)
        return idx, z_pred, x_interp, x_refined, x_oracle_interp, x_oracle_refined

    ds = MovingShapesVideoDataset(
        T=T, n_samples=args.num_samples, seed=args.sample_seed + 999,
        latent_size=int(kp_meta["latent_size"]),
    )
    host_rng = np.random.RandomState(args.sample_seed)
    key = jax.random.PRNGKey(args.sample_seed)
    os.makedirs(args.out_dir, exist_ok=True)
    agg = {k: [] for k in ["interp", "refined", "oracle_interp", "oracle_refined"]}
    panels = []
    t_total, n_total = 0.0, 0
    for bi in range(args.num_batches):
        batch = ds.get_batch(host_rng.randint(0, len(ds), size=args.batch))
        x0 = jnp.asarray(batch["x"])
        key, k_b = jax.random.split(key)
        t0 = time.time()
        idx, z_pred, x_i, x_r, xo_i, xo_r = pipeline(k_b, x0)
        x_r.block_until_ready()
        dt = time.time() - t0
        if bi > 0:
            t_total += dt
            n_total += args.batch
        for name, arr in [("interp", x_i), ("refined", x_r),
                          ("oracle_interp", xo_i), ("oracle_refined", xo_r)]:
            agg[name].append(np.asarray(((arr - x0) ** 2).mean(axis=(1, 2))))
        if bi == 0 and args.decode_panels:
            panels = {
                "gt": decode_latents(np.asarray(x0[:4])),
                "refined": decode_latents(np.asarray(x_r[:4])),
                "interp": decode_latents(np.asarray(x_i[:4])),
            }
        print(f"batch {bi}: {dt:.3f}s mse(interp)={float(np.mean(agg['interp'][-1])):.5f} "
              f"mse(refined)={float(np.mean(agg['refined'][-1])):.5f}")

    summary = {f"{k}_mse_to_gt": float(np.mean(np.concatenate(v))) for k, v in agg.items()}
    if n_total:
        summary["samples_per_sec"] = n_total / t_total
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    from ..utils.run_config import archive_evidence, write_run_config
    write_run_config(args.out_dir, args)
    archive_evidence(args.out_dir)
    if panels:
        np.savez_compressed(os.path.join(args.out_dir, "samples.npz"), **panels)
    print("summary:", json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
