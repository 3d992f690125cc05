"""Wan-1.3B full-length attention-mode benchmark (VERDICT item 5).

Measures forward and LoRA train-step time at the Wan full-mode configuration
(B=1, T=21, 60x104 latents -> L = 21*30*52 = 32 760 tokens after 2x2
patching) for the three attention modes:

  flash      dense Pallas flash attention (attn_mode="dense" routes long L
             through kernels.block_sparse_attention.flash_attention)
  sla        Pallas block-sparse + linear (topk) — the SLA analogue
  sage_sla   int8-quantized Q/K block-sparse — the SageSLA analogue

Timing uses in-jit lax.scan over ITERS iterations with a scalar pull as the
completion barrier (jax.block_until_ready does not block through the axon
tunnel). Also prints an analytic MFU estimate for the forward pass.

Run: python scripts/bench_wan33k.py [--iters 3] [--modes flash,sla,sage_sla]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interpolated_diffusion_tpu.models.wan_dit import WanDiT
from interpolated_diffusion_tpu.train.state import (
    init_train_state, make_optimizer, make_train_step_frozen,
)
from interpolated_diffusion_tpu.train.wansynth_common import split_lora_params

# Wan2.1-T2V-1.3B geometry (wan_convert.py config)
DIM, LAYERS, HEADS, FFN = 1536, 30, 12, 8960
C, T, H, W = 16, 21, 60, 104
TEXT_LEN, TEXT_DIM = 512, 4096
PATCH = 2
L = T * (H // PATCH) * (W // PATCH)            # 32 760
V5E_PEAK_TFLOPS = 197.0                        # bf16


def fwd_flops(attn_frac: float) -> float:
    """Analytic forward FLOPs for one sample (self-attn + cross + ffn)."""
    d = DIM
    per_layer = (
        4 * 2 * L * d * d                     # qkv + out projections
        + attn_frac * 2 * 2 * L * L * d       # scores + PV
        + 2 * 2 * L * d * TEXT_LEN / L * 0    # (cross-attn projections below)
        + 2 * 2 * L * TEXT_LEN * d            # cross scores + PV
        + 2 * 2 * L * d * d                   # cross q/out (k,v over text)
        + 2 * 2 * TEXT_LEN * d * d            # cross k,v projections
        + 2 * 2 * L * d * FFN                 # ffn in + out
    )
    return LAYERS * per_layer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--train_iters", type=int, default=2)
    p.add_argument("--modes", type=str, default="flash,sla,sage_sla")
    p.add_argument("--topk", type=float, default=0.1)
    p.add_argument("--sla_block", type=int, default=512)
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--skip_train", type=int, default=0)
    p.add_argument("--out_json", type=str, default=None)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (1, C, T, H, W), jnp.bfloat16)
    txt = jax.random.normal(key, (1, TEXT_LEN, TEXT_DIM), jnp.bfloat16)
    t0_arr = jnp.zeros((1,), jnp.int32)

    report = {}
    for mode in args.modes.split(","):
        attn_mode = "dense" if mode == "flash" else mode
        wan = WanDiT(
            dim=DIM, n_layers=LAYERS, n_heads=HEADS, ffn_dim=FFN,
            in_channels=C, out_channels=C, text_dim=TEXT_DIM,
            attn_mode=attn_mode, sla_topk=args.topk, sla_block=args.sla_block,
            lora_rank=args.lora_rank, layer_mode="scan", use_remat=True,
            dtype=jnp.bfloat16,
        )
        params = wan.init(key, lat, t0_arr, txt)["params"]
        n_par = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"[{mode}] params {n_par/1e9:.2f}B, L={L}", flush=True)

        # ---- forward: sequential dependent calls, scalar-pull barrier each.
        # (An in-jit lax.scan over identical iterations is invalid here: XLA's
        # while-loop invariant code motion hoists the whole loop-invariant
        # forward out of the loop, so the scan times ONE forward / iters.)
        @jax.jit
        def fwd_once(params, lat, txt, eps):
            out = wan.apply({"params": params}, lat + eps, t0_arr, txt)
            return out.astype(jnp.float32).mean()

        val = float(fwd_once(params, lat, txt, jnp.zeros((), jnp.bfloat16)))
        t0 = time.time()
        for _ in range(args.iters):
            # feed the previous scalar back in (×1e-30) so no call can be
            # elided or overlapped past the float() barrier
            val = float(fwd_once(params, lat, txt,
                                 jnp.bfloat16(val * 1e-30)))
        fwd_s = (time.time() - t0) / args.iters
        frac = args.topk if mode != "flash" else 1.0
        mfu = fwd_flops(frac) / fwd_s / 1e12 / V5E_PEAK_TFLOPS
        dense_equiv_mfu = fwd_flops(1.0) / fwd_s / 1e12 / V5E_PEAK_TFLOPS
        print(f"[{mode}] fwd {fwd_s:.3f} s  (hw MFU {mfu*100:.1f}%, "
              f"dense-equivalent {dense_equiv_mfu*100:.1f}%)", flush=True)
        report[mode] = {"fwd_s": round(fwd_s, 4), "mfu": round(mfu, 4),
                        "dense_equiv_mfu": round(dense_equiv_mfu, 4)}

        # ---- LoRA train step (frozen base partition, donated)
        if not args.skip_train:
            lora, base = split_lora_params(params)

            def loss_fn(trainable, frozen, batch, rng):
                from interpolated_diffusion_tpu.train.wansynth_common import (
                    join_lora_params,
                )
                wp = join_lora_params(trainable["lora"], frozen)
                pred = wan.apply({"params": wp}, batch["lat"], t0_arr,
                                 batch["txt"])
                return jnp.mean(pred.astype(jnp.float32) ** 2), {}

            tx = make_optimizer(1e-4)
            state = init_train_state({"lora": lora}, tx, use_ema=False)
            step = make_train_step_frozen(loss_fn, tx)
            batch = {"lat": lat, "txt": txt}
            state, m = step(state, base, batch, key)     # compile
            float(m["loss"])
            t0 = time.time()
            for _ in range(args.train_iters):
                state, m = step(state, base, batch, key)
            loss = float(m["loss"])                       # barrier
            step_s = (time.time() - t0) / args.train_iters
            print(f"[{mode}] train step {step_s:.3f} s (loss {loss:.4f})",
                  flush=True)
            report[mode]["train_step_s"] = round(step_s, 4)
        del params

    print(json.dumps(report))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
