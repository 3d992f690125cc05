"""SLA-vs-dense attention gap on the Wan DiT (reference
scripts/eval_wan_sla_gap_wansynth.py).

Runs two WanDiT forwards with IDENTICAL base weights — one dense, one
block-sparse+linear (`sla`, or int8 `sage_sla`) — on q_sampled wan-synth
latents and reports eps-MSE for each plus the prediction gap
MSE(pred_sla, pred_dense): how much accuracy the sparse kernel trades for
its speedup, measured on the actual noising distribution.

The SLA model carries extra zero-init linear-branch projections the dense
tree lacks; weights are shared by copying every intersecting leaf, so at
init the two forwards agree except for kernel-level numerics.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from ..ops.ddpm import q_sample
from ..ops.schedules import make_schedule
from ..train.wansynth_common import (
    add_wan_model_args,
    add_wansynth_data_args,
    build_wan,
    load_pretrained_into,
    make_wansynth_loader,
)


def copy_intersecting(src, dst):
    """Copy every leaf of src whose path+shape exists in dst; return new dst."""
    flat_src = traverse_util.flatten_dict(src)
    flat_dst = dict(traverse_util.flatten_dict(dst))
    n = 0
    for k, v in flat_src.items():
        if k in flat_dst and tuple(flat_dst[k].shape) == tuple(v.shape):
            flat_dst[k] = v
            n += 1
    return traverse_util.unflatten_dict(flat_dst), n


def main(argv=None):
    p = argparse.ArgumentParser("eval_wan_sla_gap")
    add_wansynth_data_args(p)
    add_wan_model_args(p)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--max_batches", type=int, default=4)
    p.add_argument("--N_train", type=int, default=1000)
    p.add_argument("--schedule", type=str, default="cosine")
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.attn_mode == "dense":
        args.attn_mode = "sla"   # the comparison needs a sparse mode
    args.lora_rank = 0           # base-weight comparison

    loader = make_wansynth_loader(args, args.seed)
    schedule = make_schedule(args.schedule, args.N_train)

    import copy

    sparse_args = args
    dense_args = copy.copy(args)
    dense_args.attn_mode = "dense"
    wan_sla = build_wan(sparse_args, bool(args.bf16))
    wan_dense = build_wan(dense_args, bool(args.bf16))

    batch0 = next(loader)
    _, T, C, H, W = batch0["latents"].shape
    key = jax.random.PRNGKey(args.seed)
    zeros = (jnp.zeros((1, C, T, H, W)), jnp.zeros((1,), jnp.int32),
             jnp.zeros((1, 8, args.text_dim)))
    p_sla = wan_sla.init(key, *zeros)["params"]
    p_sla = load_pretrained_into(p_sla, args)
    p_dense = wan_dense.init(key, *zeros)["params"]
    p_dense, n_shared = copy_intersecting(p_sla, p_dense)
    n_dense = len(traverse_util.flatten_dict(p_dense))
    print(f"shared {n_shared}/{n_dense} dense-model leaves from the SLA tree")
    if n_shared != n_dense:
        raise RuntimeError("dense tree has leaves missing from the SLA tree")

    @jax.jit
    def forward_pair(p_d, p_s, latents, text, t, eps):
        zt, _ = q_sample(latents.astype(jnp.float32), t, schedule, noise=eps)
        lat_in = jnp.transpose(zt, (0, 2, 1, 3, 4))       # [B,C,T,H,W]
        pred_d = wan_dense.apply({"params": p_d}, lat_in, t, text)
        pred_s = wan_sla.apply({"params": p_s}, lat_in, t, text)
        pred_d = jnp.transpose(pred_d, (0, 2, 1, 3, 4)).astype(jnp.float32)
        pred_s = jnp.transpose(pred_s, (0, 2, 1, 3, 4)).astype(jnp.float32)
        return (((pred_d - eps) ** 2).mean(), ((pred_s - eps) ** 2).mean(),
                ((pred_s - pred_d) ** 2).mean())

    mses_d, mses_s, gaps = [], [], []
    batch = batch0
    t0 = time.time()
    for step in range(args.max_batches):
        lat = jnp.asarray(batch["latents"])
        text = jnp.asarray(batch["text_embed"])
        key, k_t, k_e = jax.random.split(key, 3)
        t = jax.random.randint(k_t, (lat.shape[0],), 0, args.N_train)
        eps = jax.random.normal(k_e, lat.shape, jnp.float32)
        md, ms, g = forward_pair(p_dense, p_sla, lat, text, t, eps)
        mses_d.append(float(md))
        mses_s.append(float(ms))
        gaps.append(float(g))
        print(f"batch {step}: mse_dense={mses_d[-1]:.5f} "
              f"mse_{args.attn_mode}={mses_s[-1]:.5f} gap={gaps[-1]:.6f}")
        batch = next(loader)

    report = {
        "mse_dense_eps": float(np.mean(mses_d)),
        f"mse_{args.attn_mode}_eps": float(np.mean(mses_s)),
        "mse_sla_vs_dense": float(np.mean(gaps)),
        "mse_ratio": float(np.mean(mses_s) / max(np.mean(mses_d), 1e-12)),
        "elapsed_s": time.time() - t0,
    }
    print(report)
    return report


if __name__ == "__main__":
    main()
