"""Latent straightener trainer (wansynth).

Parity with reference src/train/train_latent_straightener_wansynth.py:
linearity loss (lerp in straightened space must reconstruct interior frames),
reconstruction (autoencoding) loss, and isotropy regularizer on the
straightened channel covariance (:112-133); conv or token-transformer arch.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from ..models.straightener import LatentStraightener, LatentStraightenerTokenTransformer
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import save_checkpoint
from .state import init_train_state, make_optimizer, make_train_step
from .wansynth_common import add_wansynth_data_args, make_wansynth_loader


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_latent_straightener_wansynth (TPU)")
    p.add_argument("--arch", type=str, default="conv", choices=["conv", "token"])
    p.add_argument("--hidden_channels", type=int, default=64)
    p.add_argument("--blocks", type=int, default=2)
    p.add_argument("--token_patch", type=int, default=4)
    p.add_argument("--token_d_model", type=int, default=256)
    p.add_argument("--token_layers", type=int, default=4)
    p.add_argument("--min_gap", type=int, default=2)
    p.add_argument("--w_linear", type=float, default=1.0)
    p.add_argument("--w_recon", type=float, default=1.0)
    p.add_argument("--w_iso", type=float, default=0.01)
    p.add_argument("--loss_type", type=str, default="l2", choices=["l1", "l2"])
    add_wansynth_data_args(p)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/straightener")
    p.add_argument("--save_every", type=int, default=2000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--n_data_shards", type=int, default=None)
    return p


def _err(pred, target, loss_type):
    d = pred - target
    return (d * d).mean() if loss_type == "l2" else jnp.abs(d).mean()


def iso_loss(s: jnp.ndarray) -> jnp.ndarray:
    """Channel covariance toward (mean-variance)·I (reference _iso_loss)."""
    B, C, H, W = s.shape
    flat = jnp.transpose(s, (1, 0, 2, 3)).reshape(C, -1).astype(jnp.float32)
    flat = flat - flat.mean(axis=1, keepdims=True)
    cov = (flat @ flat.T) / max(flat.shape[1] - 1, 1)
    target = jnp.eye(C) * jnp.diag(cov).mean()
    return ((cov - target) ** 2).mean()


def main(argv=None):
    args = build_argparser().parse_args(argv)
    loader = make_wansynth_loader(args, args.seed)
    T = args.T
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.arch == "conv":
        model = LatentStraightener(
            in_channels=args.latent_c, hidden_channels=args.hidden_channels,
            blocks=args.blocks, dtype=dt,
        )
    else:
        model = LatentStraightenerTokenTransformer(
            in_channels=args.latent_c, patch_size=args.token_patch,
            d_model=args.token_d_model, n_layers=args.token_layers, dtype=dt,
        )

    def loss_fn(params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        B = latents.shape[0]
        k1, k2 = jax.random.split(rng)
        gap = jax.random.randint(k1, (B,), args.min_gap, T)
        t0 = jax.random.randint(k2, (B,), 0, T) % jnp.maximum(T - gap, 1)
        t1 = jnp.minimum(t0 + gap, T - 1)
        tm = (t0 + t1) // 2
        alpha = (tm - t0).astype(jnp.float32) / jnp.maximum(t1 - t0, 1)
        take = lambda ti: jnp.take_along_axis(
            latents, ti[:, None, None, None, None], axis=1)[:, 0]
        z0, z1, zt = take(t0), take(t1), take(tm)
        z_hat, s_mid = model.apply({"params": params}, z0, z1, alpha,
                                   method="interpolate_pair")
        lin = _err(z_hat, zt, args.loss_type)
        recon = _err(model.apply({"params": params}, zt), zt, args.loss_type)
        iso = iso_loss(s_mid)
        loss = args.w_linear * lin + args.w_recon * recon + args.w_iso * iso
        return loss, {"lin": lin, "recon": recon, "iso": iso}

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    batch0 = next(loader)
    lat = jnp.asarray(batch0["latents"][:1], jnp.float32)
    params = model.init(jax.random.PRNGKey(args.seed), lat[:, 0])["params"]
    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = replicate(init_train_state(params, tx, use_ema=False), mesh)
    train_step = make_train_step(loss_fn, tx, grad_accum=1)

    meta = {"stage": "straightener", "arch": args.arch,
            "in_channels": args.latent_c, "hidden_channels": args.hidden_channels,
            "blocks": args.blocks, "token_patch": args.token_patch,
            "token_d_model": args.token_d_model, "token_layers": args.token_layers}
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
                      f"lin {float(metrics['lin']):.5f} recon {float(metrics['recon']):.5f} "
                      f"| {args.batch*(step+1)/(time.time()-t0):.1f} samples/s")
            if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
                save_checkpoint(os.path.join(args.out_dir, f"ckpt_{step + 1}"),
                                state.params, None, step + 1, None, meta)
    if hasattr(dev_iter, "close"):
        dev_iter.close()   # stop the prefetch thread, free queued batches
    return state


if __name__ == "__main__":
    main()
