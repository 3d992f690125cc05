"""Stage-1 keypoint DDPM on toy video latents.

Parity with reference src/train/train_keypoints_toy_video.py: flat
latent-frame tokens [B,T,768], uniform-spaced anchor indices, known
first/last-frame clamping over ALL dims, eps-MSE at unknown dims; the
denoiser is the maze KeypointDenoiser with empty conditioning.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.toy_video import MovingShapesVideoDataset
from ..data.dataset import BatchLoader
from ..models.denoisers import KeypointDenoiser
from ..ops.ddpm import q_sample
from ..ops.keyframes import sample_fixed_k_indices_uniform_batch
from ..ops.schedules import make_schedule
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .batches import gather_keypoints
from .state import init_train_state, make_optimizer, make_train_step


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_keypoints_toy_video (TPU)")
    p.add_argument("--T", type=int, default=16)
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--latent_size", type=int, default=16)
    p.add_argument("--N_train", type=int, default=100)
    p.add_argument("--schedule", type=str, default="linear")
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--n_layers", type=int, default=8)
    p.add_argument("--n_heads", type=int, default=8)
    p.add_argument("--d_ff", type=int, default=2048)
    p.add_argument("--clamp_endpoints", type=int, default=1)
    p.add_argument("--uniform_jitter", type=float, default=0.5)
    p.add_argument("--num_samples", type=int, default=100000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--use_ema", type=int, default=1)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/kp_toy_video")
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--n_data_shards", type=int, default=None)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    ds = MovingShapesVideoDataset(
        T=args.T, n_samples=args.num_samples, seed=args.seed,
        latent_size=args.latent_size,
    )
    data_dim = ds.data_dim
    loader = iter(BatchLoader(ds, batch_size=args.batch, seed=args.seed))
    schedule = make_schedule(args.schedule, args.N_train)
    model = KeypointDenoiser(
        d_model=args.d_model, n_layers=args.n_layers, n_heads=args.n_heads,
        d_ff=args.d_ff, data_dim=data_dim, use_start_goal=False,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    def loss_fn(params, batch, rng):
        x0 = batch["x"]
        B, T, D = x0.shape
        k_idx, k_t, k_eps = jax.random.split(rng, 3)
        idx, _ = sample_fixed_k_indices_uniform_batch(
            k_idx, B, T, args.K, ensure_endpoints=True, jitter=args.uniform_jitter
        )
        z0 = gather_keypoints(x0, idx)
        # known first/last frame over ALL dims (latents, not positions)
        ends = ((idx == 0) | (idx == T - 1))[..., None]
        known_mask = jnp.broadcast_to(ends, z0.shape) & bool(args.clamp_endpoints)
        known_values = jnp.where(known_mask, z0, 0.0)
        t = jax.random.randint(k_t, (B,), 0, args.N_train)
        z_t, eps = q_sample(z0, t, schedule, key=k_eps)
        z_t = jnp.where(known_mask, known_values, z_t)
        eps = eps * (~known_mask)
        eps_hat = model.apply({"params": params}, z_t, t, idx, known_mask, {}, T)
        valid = (~known_mask).astype(jnp.float32)
        return ((eps_hat - eps) ** 2 * valid).sum() / (valid.sum() + 1e-8), {}

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    batch0 = next(loader)
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((2, args.K, data_dim)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, args.K), jnp.int32), jnp.zeros((2, args.K, data_dim), bool),
        {}, args.T,
    )["params"]
    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = init_train_state(params, tx, use_ema=bool(args.use_ema))
    start_step = 0
    if args.resume:
        path = (args.resume if os.path.exists(os.path.join(args.resume, "meta.json"))
                else latest_checkpoint(args.resume))
        if path:
            start_step, payload = load_checkpoint(path, params, state.opt_state, params)
            state = state._replace(
                step=jnp.asarray(start_step, jnp.int32), params=payload["params"],
                opt_state=payload.get("opt_state", state.opt_state),
                ema_params=payload.get("ema", state.ema_params),
            )
    state = replicate(state, mesh)
    train_step = make_train_step(loss_fn, tx, args.ema_decay, args.grad_accum)

    meta = {
        "stage": "keypoints_toy_video", "T": args.T, "K": args.K,
        "latent_size": args.latent_size, "N_train": args.N_train,
        "schedule": args.schedule, "d_model": args.d_model,
        "n_layers": args.n_layers, "n_heads": args.n_heads, "d_ff": args.d_ff,
        "clamp_endpoints": args.clamp_endpoints, "data_dim": data_dim,
        "uniform_jitter": args.uniform_jitter,
    }
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "run_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta}, f, indent=2)

    rng = jax.random.PRNGKey(args.seed)
    batch = batch0
    t0 = time.time()
    with mesh:
        for step in range(start_step, args.steps):
            dev = shard_batch({"x": batch["x"]}, mesh)
            rng, k = jax.random.split(rng)
            state, metrics = train_step(state, dev, k)
            batch = next(loader)
            if step % args.log_every == 0:
                print(f"step {step} loss {float(metrics['loss']):.4f} "
                      f"| {args.batch*(step-start_step+1)/(time.time()-t0):.1f} samples/s")
            if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
                save_checkpoint(os.path.join(args.out_dir, f"ckpt_{step + 1}"),
                                state.params, state.opt_state, step + 1,
                                state.ema_params, meta)
    return state


if __name__ == "__main__":
    main()
