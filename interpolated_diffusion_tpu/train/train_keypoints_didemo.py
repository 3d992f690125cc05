"""DiDeMo/LSMDC Stage-1 trainer: VAE-latent token keypoint DDPM + CLIP text.

Parity with reference src/train/train_keypoints_didemo.py: consumes the
precomputed latent/text-embed cache (CachedClipDataset), patchifies frame
latents into tokens, DDPM over K anchor frames with text conditioning,
eps MSE. The same entry handles LSMDC caches (identical contract).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from ..data.dataset import BatchLoader
from ..data.didemo import CachedClipDataset
from ..models.video_denoisers import VideoTokenKeypointDenoiser
from ..ops.keyframes import sample_fixed_k_indices_uniform_batch
from ..ops.schedules import make_schedule
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from ..utils.video_tokens import patchify_latents
from .state import init_train_state, make_optimizer, make_train_step


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_keypoints_didemo (TPU)")
    p.add_argument("--cache_dir", type=str, required=True)
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--N_train", type=int, default=100)
    p.add_argument("--schedule", type=str, default="linear")
    p.add_argument("--patch_size", type=int, default=2)
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--n_layers", type=int, default=8)
    p.add_argument("--n_heads", type=int, default=8)
    p.add_argument("--d_ff", type=int, default=2048)
    p.add_argument("--uniform_jitter", type=float, default=0.5)
    p.add_argument("--cond_drop_prob", type=float, default=0.1)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--use_ema", type=int, default=1)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/kp_didemo")
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--n_data_shards", type=int, default=None)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    ds = CachedClipDataset(args.cache_dir, args.split)
    loader = iter(BatchLoader(ds, batch_size=args.batch, seed=args.seed))
    batch0 = next(loader)
    lat = batch0["latents"]
    _, T, C, H, W = lat.shape
    p_sz = args.patch_size
    spatial = (H // p_sz, W // p_sz)
    N = spatial[0] * spatial[1]
    D_tok = C * p_sz * p_sz
    text_dim = batch0["text_embed"].shape[-1]
    schedule = make_schedule(args.schedule, args.N_train)

    model = VideoTokenKeypointDenoiser(
        d_model=args.d_model, n_layers=args.n_layers, n_heads=args.n_heads,
        d_ff=args.d_ff, data_dim=D_tok, use_start_goal=False,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    def loss_fn(params, batch, rng):
        tokens, _ = patchify_latents(batch["latents"], p_sz)
        text = batch["text_embed"]
        if text.ndim == 2:
            text = text[:, None, :]
        B = tokens.shape[0]
        k_idx, k_t, k_eps, k_drop = jax.random.split(rng, 4)
        idx, _ = sample_fixed_k_indices_uniform_batch(
            k_idx, B, T, args.K, ensure_endpoints=False, jitter=args.uniform_jitter)
        z0 = jnp.take_along_axis(tokens, idx[..., None, None], axis=1)
        t = jax.random.randint(k_t, (B,), 0, args.N_train)
        eps = jax.random.normal(k_eps, z0.shape, dtype=z0.dtype)
        sab = schedule.sqrt_alpha_bar[t][:, None, None, None]
        somab = schedule.sqrt_one_minus_alpha_bar[t][:, None, None, None]
        z_t = sab * z0 + somab * eps
        if args.cond_drop_prob > 0:
            drop = jax.random.uniform(k_drop, (B,)) < args.cond_drop_prob
            text = jnp.where(drop[:, None, None], 0.0, text)
        eps_hat = model.apply({"params": params}, z_t, t, idx,
                              {"text_embed": text}, T, spatial)
        return jnp.mean((eps_hat - eps) ** 2), {}

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    params = model.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, args.K, N, D_tok)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, args.K), jnp.int32),
        {"text_embed": jnp.zeros((1, 1, text_dim))}, T, spatial)["params"]
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
                ema_params=payload.get("ema", state.ema_params))
    state = replicate(state, mesh)
    train_step = make_train_step(loss_fn, tx, args.ema_decay, args.grad_accum)

    meta = {"stage": "keypoints_didemo", "T": T, "K": args.K,
            "N_train": args.N_train, "schedule": args.schedule,
            "patch_size": p_sz, "latent_c": C, "latent_h": H, "latent_w": W,
            "text_dim": text_dim, "d_model": args.d_model,
            "n_layers": args.n_layers, "n_heads": args.n_heads, "d_ff": args.d_ff}
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "run_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta}, f, indent=2)

    rng = jax.random.PRNGKey(args.seed)
    batch = batch0
    t0 = time.time()
    with mesh:
        for step in range(start_step, args.steps):
            dev = shard_batch({"latents": batch["latents"],
                               "text_embed": batch["text_embed"]}, mesh)
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
