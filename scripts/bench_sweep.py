"""Batch-size + small-L-attention sweep for the e2e bench pipeline.

Same one-jit pipeline as bench.py (T=64, K=8, DDIM-20, stage-2 levels=3);
sweeps the batch AND the ID_TPU_SMALL_ATTN packing policy (group/full/none)
to find the throughput-optimal configuration. Prints one JSON line per
config and a final "best" line. If a config other than bench.py's default
wins by a margin, promote it there.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# `import bench` needs the repo root on sys.path even when invoked as
# `python scripts/bench_sweep.py` from elsewhere (round-2 rundown failure)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as _bench
from interpolated_diffusion_tpu.models.denoisers import (
    InterpLevelDenoiser, KeypointDenoiser,
)
from interpolated_diffusion_tpu.ops.schedules import make_schedule
from interpolated_diffusion_tpu.sample.generate import PipelineConfig, make_pipeline

BATCHES = (128, 256, 512, 1024)
ITERS = 10


def run_one(B: int) -> float:
    T, K = _bench.T, _bench.K
    kp_model = KeypointDenoiser(
        d_model=_bench.D_MODEL, n_layers=_bench.N_LAYERS, n_heads=_bench.N_HEADS,
        d_ff=_bench.D_FF, d_cond=_bench.D_COND, data_dim=_bench.DATA_DIM,
        maze_channels=_bench.MAZE_CH, dtype=jnp.bfloat16,
    )
    interp_model = InterpLevelDenoiser(
        d_model=_bench.D_MODEL, n_layers=_bench.N_LAYERS, n_heads=_bench.N_HEADS,
        d_ff=_bench.D_FF, d_cond=_bench.D_COND, data_dim=_bench.DATA_DIM,
        maze_channels=_bench.MAZE_CH, mask_channels=2, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    idx = jnp.sort(jnp.stack([
        jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jax.random.choice(jax.random.fold_in(k3, b), jnp.arange(1, T - 1),
                              (K - 2,), replace=False).astype(jnp.int32),
            jnp.full((1,), T - 1, jnp.int32),
        ]) for b in range(B)
    ]), axis=1)
    cond = {
        "occ": jax.random.bernoulli(
            k1, 0.2, (B, 1, _bench.GRID, _bench.GRID)).astype(jnp.float32),
        "start_goal": jax.random.uniform(k2, (B, 4)),
    }
    kp_params = kp_model.init(
        k1, jnp.zeros((1, K, _bench.DATA_DIM)), jnp.zeros((1,), jnp.int32),
        idx[:1], jnp.zeros((1, K, _bench.DATA_DIM), bool),
        {"occ": cond["occ"][:1], "start_goal": cond["start_goal"][:1]}, T,
    )["params"]
    interp_params = interp_model.init(
        k2, jnp.zeros((1, T, _bench.DATA_DIM)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, T, 2)),
        {"occ": cond["occ"][:1], "start_goal": cond["start_goal"][:1]},
    )["params"]
    schedule = make_schedule("linear", _bench.N_TRAIN)
    cfg = PipelineConfig(
        T=T, K=K, levels=_bench.LEVELS, K_min=_bench.K_MIN,
        ddim_steps=_bench.DDIM_STEPS, stage2_mode="adj",
        clamp_policy="endpoints", pos_clip=True,
    )
    pipeline = jax.jit(make_pipeline(kp_model, interp_model, schedule, cfg,
                                     _bench.DATA_DIM))
    out = pipeline(kp_params, interp_params, jax.random.PRNGKey(1), idx, cond)
    float(out[1].sum())  # scalar pull = completion barrier through the tunnel
    t0 = time.time()
    for i in range(ITERS):
        out = pipeline(kp_params, interp_params, jax.random.PRNGKey(2 + i),
                       idx, cond)
    float(out[1].sum())
    return B * ITERS / (time.time() - t0)


def _set_policy(policy: str) -> None:
    if ":" in policy:   # "<kind>:<row target>" (fused / block)
        kind, rows = policy.split(":")
        os.environ["ID_TPU_SMALL_ATTN"] = kind
        os.environ["ID_TPU_FUSED_ROWS"] = rows
    else:
        os.environ["ID_TPU_SMALL_ATTN"] = policy
        os.environ.pop("ID_TPU_FUSED_ROWS", None)


def main():
    results = {}
    # small-L attention policy sweep at the default batch first (cheap:
    # the policy is read at trace time; each build is a fresh jit).
    # "fused:<rows>" = the Pallas batch-packed kernel with a G·L row target
    # (kernels/small_mha.small_mha_packed; ID_TPU_FUSED_ROWS read by
    # kernels.tuning.fused_group_b via the registry — here swept directly).
    policies = ("fused:128", "fused:256", "fused:512", "full", "group",
                "none", "block:256", "block:512", "block:1024")
    if "--quick" in sys.argv:
        policies = ("fused:512", "block:256", "block:512", "block:1024")
    for policy in policies:
        _set_policy(policy)
        try:
            sps = run_one(256)
        except Exception as e:  # noqa: BLE001 — one bad policy must not
            # kill the sweep (e.g. a kernel VMEM overflow at this config)
            print(json.dumps({"batch": 256, "small_attn": policy,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        results[(256, policy)] = sps
        print(json.dumps({"batch": 256, "small_attn": policy,
                          "samples_per_sec": round(sps, 2)}), flush=True)
    best_policy = max(results, key=results.get)[1]
    _set_policy(best_policy)
    for B in BATCHES:
        if (B, best_policy) in results:
            continue
        sps = run_one(B)
        results[(B, best_policy)] = sps
        print(json.dumps({"batch": B, "small_attn": best_policy,
                          "samples_per_sec": round(sps, 2)}), flush=True)
    best = max(results, key=results.get)
    print(json.dumps({"best_batch": best[0], "best_small_attn": best[1],
                      "samples_per_sec": round(results[best], 2)}))
    if "--write_registry" in sys.argv:
        # record the measured policy winner where every small-L call site
        # reads it (kernels.tuning.small_attn_policy via ID_TPU_ATTN_TUNE)
        path = os.environ.get("ID_TPU_ATTN_TUNE", "docs/attn_autotune.json")
        try:
            with open(path) as f:
                reg = json.load(f)
        except (OSError, ValueError):
            reg = {}
        kind = best[1].split(":")[0]
        reg["small_attn"] = {
            "best": kind,
            "sweep": {f"{b}:{p}": round(s, 2)
                      for (b, p), s in sorted(results.items())},
        }
        if kind in ("fused", "block") and ":" in best[1]:
            reg["small_attn"]["fused_rows"] = int(best[1].split(":")[1])
        with open(path, "w") as f:
            json.dump(reg, f, indent=1)
        print(f"registry updated: {path}")


if __name__ == "__main__":
    main()
