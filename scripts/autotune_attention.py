"""Autotune Pallas attention block sizes on the real TPU.

Sweeps (block_m, block_n) for the three long-sequence attention kernels at
the Wan-1.3B full-length geometry (BH=12, L=32 760, D=128 — the hot op behind
docs/bench_wan33k.json) and records per-config forward and train-step (fwd+
bwd) times plus the argmin per kernel:

  flash     kernels.block_sparse_attention.flash_attention (dense exact)
  sla       kernels.block_sparse_attention.block_sparse_attention @ topk
  sage_sla  kernels.int8_attention.int8_block_sparse_attention @ topk

Timing uses dependent sequential dispatches with a host scalar pull as the
completion barrier (block_until_ready does not block through the axon
tunnel); configs that fail to lower (VMEM overflow / Mosaic limits) are
recorded as errors and skipped. Writes docs/attn_autotune.json; the current
hardwired defaults (WanDiT flash 512/1024, sla_block 512 in bench) can then
be re-pointed at the measured winners.

Run: python scripts/autotune_attention.py [--out docs/attn_autotune.json]
"""
from __future__ import annotations

import argparse
import itertools
import re
import json
import time

import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interpolated_diffusion_tpu.kernels.block_sparse_attention import (
    block_sparse_attention, flash_attention,
)
from interpolated_diffusion_tpu.kernels.int8_attention import (
    int8_block_sparse_attention,
)
from interpolated_diffusion_tpu.kernels.sla import get_block_map

_ANSI = re.compile(r"\x1b\[[0-9;]*m")
BH, L, D = 12, 32760, 128      # Wan2.1-1.3B: 12 heads, 21*30*52 tokens
TOPK = 0.1


def _timed(fn, *args, iters: int = 3) -> float:
    """Mean seconds/call: compile once, then chained dependent dispatches."""
    out = fn(*args)
    val = float(out.astype(jnp.float32).sum())      # barrier (tunnel-safe)
    t0 = time.time()
    for _ in range(iters):
        # thread the previous scalar back through q so XLA can't elide or
        # reorder calls across the host barrier
        bumped = (args[0] + jnp.asarray(val, args[0].dtype) * 1e-30,
                  *args[1:])
        val = float(fn(*bumped).astype(jnp.float32).sum())
    return (time.time() - t0) / iters


def sweep(name, fn, configs, make_args, iters, report):
    rows = {}
    for cfg in configs:
        tag = "x".join(str(c) for c in cfg)
        # fwd+bwd: differentiate w.r.t. q, k AND v so DCE can't drop any
        # of the backward kernels, and fold the three grads into one
        # array so _timed's scalar pull covers them all (defined OUTSIDE the
        # try so the retry path can reuse it after a forward failure)
        def _grad_all(*a, _c=cfg):
            grads = jax.grad(
                lambda q, k, v, *rest: fn(q, k, v, *rest, *_c)
                .astype(jnp.float32).mean(),
                argnums=(0, 1, 2))(*a)
            return grads[0] + grads[1] + grads[2]

        try:
            fwd = _timed(jax.jit(lambda *a, _c=cfg: fn(*a, *_c)),
                         *make_args(cfg), iters=iters)
            step = _timed(jax.jit(_grad_all), *make_args(cfg), iters=iters)
            rows[tag] = {"fwd_s": round(fwd, 4), "grad_s": round(step, 4)}
            print(f"[{name}] {tag}: fwd {fwd:.4f}s grad {step:.4f}s",
                  flush=True)
        except Exception as e:  # VMEM overflow / Mosaic lowering limits
            # one retry: remote-compiler hiccups (HTTP 500) are transient
            # (round-2 left a raw crash string in the registry — ADVICE #3)
            try:
                fwd = _timed(jax.jit(lambda *a, _c=cfg: fn(*a, *_c)),
                             *make_args(cfg), iters=iters)
                row = {"fwd_s": round(fwd, 4), "retried": f"{type(e).__name__}"}
                # retry the backward too: a config whose grad deterministically
                # fails to lower must be visibly grad-unsupported (it stays out
                # of best_grad; tuning._best no longer falls back across bests)
                try:
                    step = _timed(jax.jit(_grad_all), *make_args(cfg),
                                  iters=iters)
                    row["grad_s"] = round(step, 4)
                except Exception as eg:
                    # first line only, URLs dropped: multi-line remote-compiler
                    # dumps carry timestamps/ANSI/endpoints and churn the
                    # committed registry
                    msg = _ANSI.sub("", f"{type(eg).__name__}: {eg}")
                    msg = re.sub(r"https?://\S+", "<endpoint>", msg)
                    row["grad_unsupported"] = msg.splitlines()[0][:120]
                rows[tag] = row
                print(f"[{name}] {tag}: fwd {fwd:.4f}s (retry ok, "
                      f"grad={'ok' if 'grad_s' in row else 'unsupported'})",
                      flush=True)
            except Exception as e2:
                reason = _ANSI.sub("", f"{type(e2).__name__}: {e2}")[:160]
                rows[tag] = {"unsupported": reason}
                print(f"[{name}] {tag}: UNSUPPORTED {type(e2).__name__}",
                      flush=True)
    ok = {k: v for k, v in rows.items() if "fwd_s" in v}
    okg = {k: v for k, v in ok.items() if "grad_s" in v}  # retried rows lack grad_s
    report[name] = {
        "configs": rows,
        "best_fwd": min(ok, key=lambda k: ok[k]["fwd_s"]) if ok else None,
        "best_grad": min(okg, key=lambda k: okg[k]["grad_s"]) if okg else None,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--kernels", type=str, default="flash,sla,sage_sla")
    p.add_argument("--out", type=str, default="docs/attn_autotune.json")
    p.add_argument("--bh", type=int, default=BH)
    p.add_argument("--L", type=int, default=L)
    p.add_argument("--interpret", type=int, default=0,
                   help="off-TPU smoke: interpret-mode kernels at a tiny "
                        "geometry (timings are meaningless)")
    args = p.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (args.bh, args.L, D), jnp.bfloat16)
    k = jax.random.normal(kk, (args.bh, args.L, D), jnp.bfloat16)
    v = jax.random.normal(kv, (args.bh, args.L, D), jnp.bfloat16)

    report = {"geometry": {"BH": args.bh, "L": args.L, "D": D, "topk": TOPK},
              "backend": jax.devices()[0].platform}

    want = set(args.kernels.split(","))
    flash_cfgs = list(itertools.product([256, 512, 1024], [512, 1024, 2048]))
    sparse_cfgs = [(128, 128), (256, 256), (512, 512)]
    if args.interpret:
        flash_cfgs, sparse_cfgs = [(128, 128)], [(128, 128)]

    if "flash" in want:
        fl = (lambda q, k, v, bm, bn:
              flash_attention(q, k, v, bm, bn, interpret=True)) \
            if args.interpret else flash_attention
        sweep("flash", fl, flash_cfgs, lambda cfg: (q, k, v),
              args.iters, report)

    # block-sparse LUT depends on the block size — rebuild per config
    def sparse_args(cfg):
        bm = cfg[0]
        _, lut, _ = get_block_map(q.astype(jnp.float32),
                                  k.astype(jnp.float32), TOPK, bm, bm)
        return (q, k, v, jax.device_put(lut))

    if "sla" in want:
        bsa = (lambda q, k, v, lut, bm, bn: block_sparse_attention(
            q, k, v, lut, bm, bn, impl="xla", bwd_impl="xla")) \
            if args.interpret else block_sparse_attention
        sweep("sla", bsa, sparse_cfgs, sparse_args, args.iters, report)
    if "sage_sla" in want:
        i8 = (lambda q, k, v, lut, bm, bn: int8_block_sparse_attention(
            q, k, v, lut, bm, bn, interpret=True)) \
            if args.interpret else int8_block_sparse_attention
        sweep("sage_sla", i8, sparse_cfgs, sparse_args, args.iters, report)

    print(json.dumps({kname: {kk2: vv for kk2, vv in kv2.items()
                              if kk2 != "configs"}
                      for kname, kv2 in report.items() if isinstance(kv2, dict)}))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
