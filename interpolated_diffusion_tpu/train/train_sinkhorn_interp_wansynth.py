"""Sinkhorn warp interpolator trainer (wansynth).

Parity with reference src/train/train_sinkhorn_interp_wansynth.py: trains the
matcher's learnable τ and dustbin (± an attached straightener) end-to-end
through the warp on anchor→interior reconstruction; validates against the
LERP baseline (:252) every val_every steps.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sinkhorn_warp import SinkhornWarpInterpolator
from ..ops.keyframes import sample_fixed_k_indices_batch
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import save_checkpoint
from .state import init_train_state, make_optimizer, make_train_step
from .wansynth_common import add_wansynth_data_args, make_wansynth_loader


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_sinkhorn_interp_wansynth (TPU)")
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--sinkhorn_patch", type=int, default=4)
    p.add_argument("--win_size", type=int, default=5)
    p.add_argument("--sinkhorn_iters", type=int, default=20)
    p.add_argument("--sinkhorn_tau", type=float, default=0.05)
    p.add_argument("--dustbin_logit", type=float, default=-2.0)
    p.add_argument("--learn_tau", type=int, default=1)
    p.add_argument("--learn_dustbin", type=int, default=1)
    p.add_argument("--fb_sigma", type=float, default=2.0)
    p.add_argument("--d_match", type=int, default=0)
    p.add_argument("--global_mode", type=str, default="phasecorr",
                   choices=["phasecorr", "none"])
    p.add_argument("--val_every", type=int, default=500)
    p.add_argument("--val_batches", type=int, default=4)
    add_wansynth_data_args(p)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/sinkhorn_interp")
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--n_data_shards", type=int, default=None)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    loader = make_wansynth_loader(args, args.seed)
    T = args.T
    model = SinkhornWarpInterpolator(
        in_channels=args.latent_c, patch_size=args.sinkhorn_patch,
        win_size=args.win_size, global_mode=args.global_mode,
        sinkhorn_iters=args.sinkhorn_iters, sinkhorn_tau=args.sinkhorn_tau,
        dustbin_logit=args.dustbin_logit, learn_tau=bool(args.learn_tau),
        learn_dustbin=bool(args.learn_dustbin), fb_sigma=args.fb_sigma,
        d_match=args.d_match,
    )

    def loss_fn(params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        B = latents.shape[0]
        idx, mask = sample_fixed_k_indices_batch(rng, B, T, args.K)
        out, conf = model.apply({"params": params}, latents, idx)
        hidden = (~mask)[..., None, None, None]
        loss = (((out - latents) ** 2) * hidden).sum() / (
            hidden.sum() * latents.shape[2] * latents.shape[3] * latents.shape[4] + 1e-8
        )
        return loss, {}

    def lerp_baseline(latents, idx):
        from ..ops.keyframes import interpolate_from_indices

        B, T_, C, H, W = latents.shape
        flat = latents.reshape(B, T_, -1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return interpolate_from_indices(idx, vals, T_).reshape(latents.shape)

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    batch0 = next(loader)
    lat0 = jnp.asarray(batch0["latents"][:1], jnp.float32)
    idx0, _ = sample_fixed_k_indices_batch(jax.random.PRNGKey(0), 1, T, args.K)
    params = model.init(jax.random.PRNGKey(args.seed), lat0, idx0)["params"]
    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = replicate(init_train_state(params, tx, use_ema=False), mesh)
    train_step = make_train_step(loss_fn, tx, grad_accum=1, donate=False)

    meta = {"stage": "sinkhorn_interp", "in_channels": args.latent_c,
            "patch_size": args.sinkhorn_patch, "win_size": args.win_size,
            "sinkhorn_iters": args.sinkhorn_iters, "global_mode": args.global_mode,
            "sinkhorn_tau": args.sinkhorn_tau,
            "dustbin_logit": args.dustbin_logit,
            "learn_tau": args.learn_tau, "learn_dustbin": args.learn_dustbin,
            "fb_sigma": args.fb_sigma, "d_match": args.d_match}
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "run_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta}, f, indent=2)

    @jax.jit
    def val_step(params, latents, idx):
        out, _ = model.apply({"params": params}, latents, idx)
        lerp = lerp_baseline(latents, idx)
        return ((out - latents) ** 2).mean(), ((lerp - latents) ** 2).mean()

    rng = jax.random.PRNGKey(args.seed)
    batch = batch0
    t0 = time.time()
    with mesh:
        for step in range(args.steps):
            dev = shard_batch({"latents": batch["latents"]}, mesh)
            rng, k = jax.random.split(rng)
            state, metrics = train_step(state, dev, k)
            batch = next(loader)
            if step % args.log_every == 0:
                print(f"step {step} loss {float(metrics['loss']):.5f} "
                      f"| {args.batch*(step+1)/(time.time()-t0):.1f} samples/s")
            if args.val_every and (step + 1) % args.val_every == 0:
                mses, lerps = [], []
                for _ in range(args.val_batches):
                    vb = next(loader)
                    rng, kv = jax.random.split(rng)
                    idx, _ = sample_fixed_k_indices_batch(
                        kv, vb["latents"].shape[0], T, args.K)
                    m, l = val_step(state.params, jnp.asarray(vb["latents"], jnp.float32), idx)
                    mses.append(float(m))
                    lerps.append(float(l))
                print(f"[val] sinkhorn {np.mean(mses):.5f} vs lerp {np.mean(lerps):.5f}")
            if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
                save_checkpoint(os.path.join(args.out_dir, f"ckpt_{step + 1}"),
                                state.params, None, step + 1, None, meta)
    return state


if __name__ == "__main__":
    main()
