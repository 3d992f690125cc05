"""Video keyframe selector trainer (wansynth).

Parity with reference src/train/train_video_selector_wansynth.py: DP labels
from the oracle latent-MSE cost matrix (:125 integrated cost), BCE with
positive-class weighting, optional level conditioning, top-K overlap eval
(:156) against the DP labels.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.video_selector import VideoKeyframeSelector
from ..ops.oracle_segment_cost import build_oracle_seg_precompute, compute_oracle_cost_seg_mse
from ..ops.selection import build_cost_matrix_from_segments, dp_select_indices_batch
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import save_checkpoint
from .state import init_train_state, make_optimizer, make_train_step
from .wansynth_common import add_wansynth_data_args, make_wansynth_loader


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_video_selector_wansynth (TPU)")
    p.add_argument("--K", type=int, default=5)
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--d_cond", type=int, default=256)
    p.add_argument("--n_sel_layers", type=int, default=4)
    p.add_argument("--n_heads", type=int, default=8)
    p.add_argument("--d_ff", type=int, default=1024)
    p.add_argument("--use_level", type=int, default=0)
    add_wansynth_data_args(p)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/video_selector")
    p.add_argument("--save_every", type=int, default=2000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--n_data_shards", type=int, default=None)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    loader = make_wansynth_loader(args, args.seed)
    T = args.T
    pre = build_oracle_seg_precompute(T)
    model = VideoKeyframeSelector(
        T=T, d_model=args.d_model, d_cond=args.d_cond,
        n_layers=args.n_sel_layers, n_heads=args.n_heads, d_ff=args.d_ff,
        use_level=bool(args.use_level),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )

    @jax.jit
    def dp_labels(latents):
        z = latents.reshape(latents.shape[0], T, -1)
        cost = compute_oracle_cost_seg_mse(z, pre, normalize=False)
        C = build_cost_matrix_from_segments(cost, pre, T)
        idx = dp_select_indices_batch(C, args.K)
        B = latents.shape[0]
        return jnp.zeros((B, T)).at[jnp.arange(B)[:, None], idx].set(1.0), idx

    def loss_fn(params, batch, rng):
        target = batch["target"]
        cond = {"text_embed": batch["text_embed"]}
        if args.use_level:
            cond["level"] = jnp.full((target.shape[0], 1), args.K / max(1, T - 1))
        logits = model.apply({"params": params}, cond)
        bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        pos_w = (T - args.K) / max(1.0, args.K)
        w = 1.0 + (pos_w - 1.0) * target
        return (bce * w).mean(), {}

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    batch0 = next(loader)
    cond0 = {"text_embed": jnp.asarray(batch0["text_embed"][:1])}
    if args.use_level:
        cond0["level"] = jnp.zeros((1, 1))
    params = model.init(jax.random.PRNGKey(args.seed), cond0)["params"]
    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = replicate(init_train_state(params, tx, use_ema=False), mesh)
    train_step = make_train_step(loss_fn, tx, grad_accum=1, donate=False)

    @jax.jit
    def overlap_eval(params, batch_text, idx_dp):
        cond = {"text_embed": batch_text}
        if args.use_level:
            cond["level"] = jnp.full((batch_text.shape[0], 1), args.K / max(1, T - 1))
        logits = model.apply({"params": params}, cond)
        _, top = jax.lax.top_k(logits, args.K)
        pred_mask = jnp.zeros((batch_text.shape[0], T)).at[
            jnp.arange(batch_text.shape[0])[:, None], top].set(1.0)
        dp_mask = jnp.zeros_like(pred_mask).at[
            jnp.arange(batch_text.shape[0])[:, None], idx_dp].set(1.0)
        return (pred_mask * dp_mask).sum(1) / args.K

    meta = {"stage": "video_selector", "T": T, "K": args.K,
            "d_model": args.d_model, "d_cond": args.d_cond,
            "n_layers": args.n_sel_layers, "n_heads": args.n_heads,
            "d_ff": args.d_ff, "use_level": args.use_level,
            "text_dim": args.text_dim}
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "run_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta}, f, indent=2)

    rng = jax.random.PRNGKey(args.seed)
    batch = batch0
    t0 = time.time()
    with mesh:
        for step in range(args.steps):
            target, idx_dp = dp_labels(jnp.asarray(batch["latents"]))
            dev = shard_batch({"text_embed": batch["text_embed"]}, mesh)
            dev["target"] = target
            rng, k = jax.random.split(rng)
            state, metrics = train_step(state, dev, k)
            if args.eval_every and (step + 1) % args.eval_every == 0:
                ov = overlap_eval(state.params, jnp.asarray(batch["text_embed"]), idx_dp)
                print(f"[eval] top-K/DP overlap {float(ov.mean()):.3f}")
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
