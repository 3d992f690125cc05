"""Latent flow interpolator trainer (wansynth).

Parity with reference src/train/train_flow_interpolator_wansynth.py: triplet
sampling (anchor pair + interior target), reconstruction + uncertainty losses
with optional edge-gradient, multiscale-L1, flow-smoothness and gap-weight
terms; trains LatentFlowPredictor end-to-end through the warp.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from ..models.flow_interpolator import LatentFlowInterpolator
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import save_checkpoint
from .state import init_train_state, make_optimizer, make_train_step
from .wansynth_common import add_wansynth_data_args, make_wansynth_loader


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_flow_interpolator_wansynth (TPU)")
    p.add_argument("--base_channels", type=int, default=32)
    p.add_argument("--max_flow", type=float, default=20.0)
    p.add_argument("--residual_blocks", type=int, default=2)
    p.add_argument("--time_mask", type=int, default=1)
    p.add_argument("--gap_cond", type=int, default=1)
    p.add_argument("--cost_volume", type=int, default=1)
    p.add_argument("--cv_radius", type=int, default=2)
    p.add_argument("--min_gap", type=int, default=2)
    p.add_argument("--uncertainty_loss_weight", type=float, default=0.1)
    p.add_argument("--edge_weight", type=float, default=0.0)
    p.add_argument("--ms_weight", type=float, default=0.0)
    p.add_argument("--flow_smooth_weight", type=float, default=0.0)
    p.add_argument("--gap_weighting", type=int, default=0)
    add_wansynth_data_args(p)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/flow_interp")
    p.add_argument("--save_every", type=int, default=2000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--n_data_shards", type=int, default=None)
    return p


def _gradient_loss(pred, target):
    """L1 on spatial gradients (edge preservation)."""
    dpx = jnp.abs(jnp.diff(pred, axis=-1)) - jnp.abs(jnp.diff(target, axis=-1))
    dpy = jnp.abs(jnp.diff(pred, axis=-2)) - jnp.abs(jnp.diff(target, axis=-2))
    return jnp.abs(dpx).mean() + jnp.abs(dpy).mean()


def _flow_smoothness(flow):
    return (jnp.abs(jnp.diff(flow, axis=-1)).mean()
            + jnp.abs(jnp.diff(flow, axis=-2)).mean())


def main(argv=None):
    args = build_argparser().parse_args(argv)
    loader = make_wansynth_loader(args, args.seed)
    T = args.T
    model = LatentFlowInterpolator(
        in_channels=args.latent_c, base_channels=args.base_channels,
        max_flow=args.max_flow, residual_blocks=args.residual_blocks,
        time_mask=bool(args.time_mask), gap_cond=bool(args.gap_cond),
        use_cost_volume=bool(args.cost_volume), cv_radius=args.cv_radius,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    def loss_fn(params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)  # [B,T,C,H,W]
        B = latents.shape[0]
        k1, k2 = jax.random.split(rng)
        # triplets: t0 < t < t1 with gap >= min_gap
        gap = jax.random.randint(k1, (B,), args.min_gap, T)
        t0 = jax.random.randint(k2, (B,), 0, T) % jnp.maximum(T - gap, 1)
        t1 = jnp.minimum(t0 + gap, T - 1)
        tm = (t0 + t1) // 2
        alpha = (tm - t0).astype(jnp.float32) / jnp.maximum(t1 - t0, 1)
        take = lambda ti: jnp.take_along_axis(
            latents, ti[:, None, None, None, None], axis=1)[:, 0]
        z0, z1, zt = take(t0), take(t1), take(tm)
        gap_f = (t1 - t0).astype(jnp.float32)
        z_hat, unc = model.apply(
            {"params": params}, z0, z1, alpha,
            gap=gap_f if args.gap_cond else None,
            method="interpolate_pair",
        )
        err = jnp.abs(z_hat - zt)
        err_per = err.mean(axis=(1, 2, 3))
        if args.gap_weighting:
            w = gap_f / gap_f.mean()
            recon = (err_per * w).mean()
        else:
            recon = err_per.mean()
        # uncertainty regression toward the actual normalized error
        u_target = jax.lax.stop_gradient(
            jnp.clip(err.mean(axis=1, keepdims=True), 0.0, 1.0))
        unc_loss = jnp.abs(unc - u_target).mean()
        loss = recon + args.uncertainty_loss_weight * unc_loss
        if args.edge_weight > 0:
            loss = loss + args.edge_weight * _gradient_loss(z_hat, zt)
        if args.ms_weight > 0:
            from ..ops.image import avg_pool2d
            loss = loss + args.ms_weight * jnp.abs(
                avg_pool2d(z_hat, 2) - avg_pool2d(zt, 2)).mean()
        if args.flow_smooth_weight > 0:
            flow01, flow10, *_ = model.apply(
                {"params": params}, z0, z1,
                gap=gap_f if args.gap_cond else None, method="predict_flow")
            loss = loss + args.flow_smooth_weight * (
                _flow_smoothness(flow01) + _flow_smoothness(flow10))
        return loss, {"recon": recon}

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    batch0 = next(loader)
    lat = jnp.asarray(batch0["latents"][:1], jnp.float32)
    params = model.init(
        jax.random.PRNGKey(args.seed), lat[:, 0], lat[:, -1], jnp.array([0.5]),
        gap=jnp.array([4.0]) if args.gap_cond else None, method="interpolate_pair",
    )["params"]
    print(f"flow interp params: "
          f"{sum(x.size for x in jax.tree_util.tree_leaves(params))/1e6:.2f}M")
    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = replicate(init_train_state(params, tx, use_ema=False), mesh)
    train_step = make_train_step(loss_fn, tx, grad_accum=1)

    meta = {"stage": "flow_interpolator", "in_channels": args.latent_c,
            "base_channels": args.base_channels, "max_flow": args.max_flow,
            "residual_blocks": args.residual_blocks, "time_mask": args.time_mask,
            "gap_cond": args.gap_cond, "cost_volume": args.cost_volume,
            "cv_radius": args.cv_radius}
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "run_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta}, f, indent=2)

    rng = jax.random.PRNGKey(args.seed)
    import itertools

    from ..utils.prefetch import DevicePrefetcher

    def _put(b):
        return shard_batch({"latents": b["latents"]}, mesh)

    host_iter = itertools.chain([batch0], loader)
    dev_iter = (DevicePrefetcher(host_iter, _put,
                                 depth=args.prefetch_depth)
                if args.prefetch_depth > 0
                else map(_put, host_iter))
    t0 = time.time()
    with mesh:
        for step in range(args.steps):
            dev = next(dev_iter)
            rng, k = jax.random.split(rng)
            state, metrics = train_step(state, dev, k)
            if step % args.log_every == 0:
                print(f"step {step} loss {float(metrics['loss']):.5f} "
                      f"recon {float(metrics['recon']):.5f} "
                      f"| {args.batch*(step+1)/(time.time()-t0):.1f} samples/s")
            if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
                save_checkpoint(os.path.join(args.out_dir, f"ckpt_{step + 1}"),
                                state.params, None, step + 1, None, meta)
    if hasattr(dev_iter, "close"):
        dev_iter.close()   # stop the prefetch thread, free queued batches
    return state


if __name__ == "__main__":
    main()
