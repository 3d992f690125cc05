"""DiDeMo/LSMDC Stage-2 trainer: token interp-level refinement + CLIP text.

Parity with reference src/train/train_interp_levels_didemo.py: token
corruption over cached VAE latents, adj/x0 targets with confidence channels,
conf-weighted MSE, text conditioning.
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
from ..models.video_denoisers import VideoTokenInterpLevelDenoiser
from ..ops.video_keyframes import (
    build_video_token_interp_adjacent_batch,
    build_video_token_interp_level_batch,
)
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from ..utils.video_tokens import patchify_latents
from .state import init_train_state, make_optimizer, make_train_step


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_interp_levels_didemo (TPU)")
    p.add_argument("--cache_dir", type=str, required=True)
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--K_min", type=int, default=4)
    p.add_argument("--levels", type=int, default=2)
    p.add_argument("--mode", type=str, default="adj", choices=["adj", "x0"])
    p.add_argument("--patch_size", type=int, default=2)
    p.add_argument("--interp_mode", type=str, default="linear", choices=["linear", "smooth"])
    p.add_argument("--corrupt_mode", type=str, default="gauss", choices=["none", "gauss", "dist"])
    p.add_argument("--corrupt_sigma", type=float, default=0.02)
    p.add_argument("--student_replace_prob", type=float, default=0.5)
    p.add_argument("--student_noise_std", type=float, default=0.02)
    p.add_argument("--w_anchor", type=float, default=1.0)
    p.add_argument("--w_missing", type=float, default=1.0)
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--n_layers", type=int, default=8)
    p.add_argument("--n_heads", type=int, default=8)
    p.add_argument("--d_ff", type=int, default=2048)
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
    p.add_argument("--out_dir", type=str, default="runs/il_didemo")
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
    _, T, C, H, W = batch0["latents"].shape
    p_sz = args.patch_size
    spatial = (H // p_sz, W // p_sz)
    N = spatial[0] * spatial[1]
    D_tok = C * p_sz * p_sz
    text_dim = batch0["text_embed"].shape[-1]
    mask_channels = (2 if args.mode == "adj" else 1) + 1

    model = VideoTokenInterpLevelDenoiser(
        d_model=args.d_model, n_layers=args.n_layers, n_heads=args.n_heads,
        d_ff=args.d_ff, data_dim=D_tok, use_start_goal=False,
        max_levels=max(8, args.levels), mask_channels=mask_channels,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    corr = dict(corrupt_mode=args.corrupt_mode, corrupt_sigma=args.corrupt_sigma,
                student_replace_prob=args.student_replace_prob,
                student_noise_std=args.student_noise_std,
                interp_mode=args.interp_mode, clamp_endpoints=False)

    def loss_fn(params, batch, rng):
        tokens, _ = patchify_latents(batch["latents"], p_sz)
        text = batch["text_embed"]
        if text.ndim == 2:
            text = text[:, None, :]
        if args.mode == "adj":
            (z_s, z_prev, mask_s, mask_prev, s_idx, _, _, conf_s, conf_prev) = (
                build_video_token_interp_adjacent_batch(
                    rng, tokens, args.K_min, args.levels, **corr))
            target = z_prev - z_s
            mask_in = jnp.stack([mask_s.astype(jnp.float32),
                                 mask_prev.astype(jnp.float32), conf_s], axis=-1)
            weight = conf_prev
        else:
            z_s, mask_s, s_idx, _, _, conf_s = build_video_token_interp_level_batch(
                rng, tokens, args.K_min, args.levels, **corr)
            target = tokens - z_s
            mask_in = jnp.stack([mask_s.astype(jnp.float32), conf_s], axis=-1)
            weight = conf_s
        delta = model.apply({"params": params}, z_s, s_idx, mask_in,
                            {"text_embed": text}, spatial)
        diff = ((delta - target) ** 2).sum(axis=-1)
        w = args.w_missing + (args.w_anchor - args.w_missing) * weight
        return (diff * w).sum() / (w.sum() * D_tok + 1e-8), {}

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    params = model.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, T, N, D_tok)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, T, N, mask_channels)),
        {"text_embed": jnp.zeros((1, 1, text_dim))}, spatial)["params"]
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

    meta = {"stage": "interp_levels_didemo", "T": T, "K_min": args.K_min,
            "levels": args.levels, "mode": args.mode, "patch_size": p_sz,
            "latent_c": C, "latent_h": H, "latent_w": W, "text_dim": text_dim,
            "mask_channels": mask_channels, "d_model": args.d_model,
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
