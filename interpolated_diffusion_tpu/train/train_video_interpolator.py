"""TinyTemporalInterpolator trainer (toy-video or wansynth latents).

Parity with reference src/train/train_video_interpolator.py and
train_video_interpolator_wansynth.py: sample anchor sets, lerp, refine with
the depthwise temporal conv, MSE on the hidden (non-anchor) frames.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from ..data.dataset import BatchLoader
from ..data.toy_video import MovingShapesVideoDataset
from ..models.interpolators import TinyTemporalInterpolator
from ..ops.keyframes import interpolate_from_indices, sample_fixed_k_indices_batch
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import save_checkpoint
from .state import init_train_state, make_optimizer, make_train_step
from .wansynth_common import add_wansynth_data_args, make_wansynth_loader


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_video_interpolator (TPU)")
    p.add_argument("--workload", type=str, default="toy", choices=["toy", "wansynth"])
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--kernel_size", type=int, default=3)
    p.add_argument("--n_conv_layers", type=int, default=2)
    p.add_argument("--latent_size", type=int, default=16)
    add_wansynth_data_args(p)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/video_interp")
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--n_data_shards", type=int, default=None)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.workload == "toy":
        ds = MovingShapesVideoDataset(T=args.T, n_samples=args.num_samples,
                                      seed=args.seed, latent_size=args.latent_size)
        loader = iter(BatchLoader(ds, batch_size=args.batch, seed=args.seed))
        get_flat = lambda b: b["x"]
        data_dim = ds.data_dim
    else:
        loader = make_wansynth_loader(args, args.seed)
        get_flat = lambda b: b["latents"].reshape(
            b["latents"].shape[0], b["latents"].shape[1], -1)
        data_dim = args.latent_c * args.latent_h * args.latent_w

    model = TinyTemporalInterpolator(
        data_dim=data_dim, kernel_size=args.kernel_size,
        n_layers=args.n_conv_layers,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    def loss_fn(params, batch, rng):
        z0 = batch["z"]
        B, T, D = z0.shape
        k_idx = rng
        idx, mask = sample_fixed_k_indices_batch(k_idx, B, T, args.K)
        vals = jnp.take_along_axis(z0, idx[..., None], axis=1)
        z_lerp = interpolate_from_indices(idx, vals, T)
        z_hat = z_lerp + model.apply({"params": params}, z_lerp)
        hidden = (~mask)[..., None]
        loss = (((z_hat - z0) ** 2) * hidden).sum() / (hidden.sum() * D + 1e-8)
        return loss, {}

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    batch0 = next(loader)
    z0 = get_flat(batch0)
    params = model.init(jax.random.PRNGKey(args.seed), jnp.zeros_like(z0[:1]))["params"]
    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = replicate(init_train_state(params, tx, use_ema=False), mesh)
    train_step = make_train_step(loss_fn, tx, grad_accum=1)

    meta = {"stage": "video_interpolator", "T": args.T, "K": args.K,
            "kernel_size": args.kernel_size, "n_layers": args.n_conv_layers,
            "data_dim": data_dim, "workload": args.workload}
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "run_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta}, f, indent=2)

    rng = jax.random.PRNGKey(args.seed)
    batch = batch0
    t0 = time.time()
    with mesh:
        for step in range(args.steps):
            dev = shard_batch({"z": get_flat(batch)}, mesh)
            rng, k = jax.random.split(rng)
            state, metrics = train_step(state, dev, k)
            batch = next(loader)
            if step % args.log_every == 0:
                print(f"step {step} loss {float(metrics['loss']):.5f} "
                      f"| {args.batch*(step+1)/(time.time()-t0):.1f} samples/s")
            if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
                save_checkpoint(os.path.join(args.out_dir, f"ckpt_{step + 1}"),
                                state.params, None, step + 1, None, meta)
    return state


if __name__ == "__main__":
    main()
