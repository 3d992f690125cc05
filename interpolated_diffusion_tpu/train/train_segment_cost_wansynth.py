"""Video D_phi trainer (wansynth): text-conditioned segment-cost regression.

Parity with reference src/train/train_segment_cost_wansynth.py: targets are
exact latent-MSE oracle segment costs (:100-242 latent-MSE mode) computed on
the fly; the predictor is the SegmentCostPredictor family with a text
condition encoder.
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.encoders import TextConditionEncoder
from ..ops.oracle_segment_cost import build_oracle_seg_precompute, compute_oracle_cost_seg_mse
from ..ops.selection import build_segment_features
from ..parallel.mesh import make_mesh_for_batch, replicate, shard_batch
from ..utils.checkpoint import save_checkpoint
from .state import init_train_state, make_optimizer, make_train_step
from .wansynth_common import add_wansynth_data_args, make_wansynth_loader


class VideoSegmentCostPredictor(nn.Module):
    """Text cond vec + [i/T, j/T, gap/T] -> scalar cost per segment."""

    d_cond: int = 256
    hidden_dim: int = 256
    n_layers: int = 3
    dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Dict, seg_feat: jnp.ndarray) -> jnp.ndarray:
        cond_vec = TextConditionEncoder(d_cond=self.d_cond, dtype=self.dtype,
                                        name="text_enc")(cond)
        if seg_feat.ndim == 2:
            seg_feat = jnp.broadcast_to(
                seg_feat[None], (cond_vec.shape[0], *seg_feat.shape))
        cond_exp = jnp.broadcast_to(
            cond_vec[:, None], (cond_vec.shape[0], seg_feat.shape[1], self.d_cond))
        x = jnp.concatenate([cond_exp, seg_feat.astype(self.dtype)], axis=-1)
        for i in range(max(1, self.n_layers - 1)):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"fc_{i}")(x)
            x = nn.silu(x)
        return nn.Dense(1, dtype=self.dtype, name="out")(x)[..., 0].astype(jnp.float32)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train_segment_cost_wansynth (TPU)")
    p.add_argument("--d_cond", type=int, default=256)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--n_mlp_layers", type=int, default=3)
    p.add_argument("--normalize_targets", type=int, default=1)
    add_wansynth_data_args(p)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/segcost_wansynth")
    p.add_argument("--save_every", type=int, default=2000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--n_data_shards", type=int, default=None)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    loader = make_wansynth_loader(args, args.seed)
    T = args.T
    pre = build_oracle_seg_precompute(T)
    seg_feat = build_segment_features(T, pre.seg_i, pre.seg_j)
    model = VideoSegmentCostPredictor(
        d_cond=args.d_cond, hidden_dim=args.hidden_dim, n_layers=args.n_mlp_layers)

    batch0 = next(loader)
    stats = compute_oracle_cost_seg_mse(
        jnp.asarray(batch0["latents"]).reshape(args.batch, T, -1), pre)
    t_mean = float(stats.mean())
    t_std = max(1e-6, float(stats.std())) if args.normalize_targets else 1.0
    if not args.normalize_targets:
        t_mean = 0.0

    def loss_fn(params, batch, rng):
        z = batch["latents"].reshape(batch["latents"].shape[0], T, -1)
        target = jax.lax.stop_gradient(
            (compute_oracle_cost_seg_mse(z, pre) - t_mean) / t_std)
        pred = model.apply({"params": params},
                           {"text_embed": batch["text_embed"]}, seg_feat)
        return jnp.mean((pred - target) ** 2), {}

    mesh = make_mesh_for_batch(args.batch, n_data=args.n_data_shards)
    params = model.init(
        jax.random.PRNGKey(args.seed),
        {"text_embed": jnp.asarray(batch0["text_embed"][:1])}, seg_feat)["params"]
    tx = make_optimizer(args.lr, args.weight_decay, args.grad_clip)
    state = replicate(init_train_state(params, tx, use_ema=False), mesh)
    train_step = make_train_step(loss_fn, tx, grad_accum=1)

    meta = {"stage": "segment_cost_wansynth", "T": T, "d_cond": args.d_cond,
            "hidden_dim": args.hidden_dim, "n_layers": args.n_mlp_layers,
            "normalize_targets": args.normalize_targets,
            "target_mean": t_mean, "target_std": t_std,
            "text_dim": args.text_dim}
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "run_config.json"), "w") as f:
        json.dump({"args": vars(args), "meta": meta}, f, indent=2)

    rng = jax.random.PRNGKey(args.seed)
    batch = batch0
    t0 = time.time()
    with mesh:
        for step in range(args.steps):
            dev = shard_batch({"latents": batch["latents"],
                               "text_embed": batch["text_embed"]}, mesh)
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
