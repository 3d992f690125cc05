"""Per-level Stage-2 model error (reference diagnose_stage2_model_error.py).

Evaluates a trained Stage-2 checkpoint's delta prediction error at every
corruption level on held-out data — separates which levels the model actually
learned to refine.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loading import load_interp_model
from ..train.batches import build_interp_adjacent_batch, build_interp_level_batch
from ..train.common import add_data_args, make_dataset
from ..train.train_interp_levels import build_anchor_conf


def main(argv=None):
    p = argparse.ArgumentParser("diagnose_stage2_model_error")
    p.add_argument("--interp_ckpt", type=str, required=True)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--num_batches", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", type=int, default=0)
    p.add_argument("--out_json", type=str, default=None)
    add_data_args(p)
    args = p.parse_args(argv)

    model, params, meta = load_interp_model(args.interp_ckpt, bool(args.bf16))
    T, K_min, levels = int(meta["T"]), int(meta["K_min"]), int(meta["levels"])
    mode = meta.get("mode", "adj")
    anchor_conf = bool(meta.get("anchor_conf", 0))
    args.T = T
    ds, _ = make_dataset(args)

    @jax.jit
    def level_error(key, x0, cond, s):
        B = x0.shape[0]
        s_idx = jnp.full((B,), s, dtype=jnp.int32)
        if mode == "adj":
            x_s, x_prev, mask_s, mask_prev, _, _, _ = build_interp_adjacent_batch(
                key, x0, K_min, levels, s_idx=s_idx)
            target = x_prev - x_s
            chans = [mask_s.astype(jnp.float32), mask_prev.astype(jnp.float32)]
            if anchor_conf:
                chans.append(build_anchor_conf(mask_s, None, 0.95, 0.5, 1.0, 0.0, True))
            mask_in = jnp.stack(chans, axis=-1)
        else:
            x_s, mask_s, _, _, _ = build_interp_level_batch(
                key, x0, K_min, levels, s_idx=s_idx)
            target = x0 - x_s
            if anchor_conf:
                conf = build_anchor_conf(mask_s, None, 0.95, 0.5, 1.0, 0.0, True)
                mask_in = jnp.stack([mask_s.astype(jnp.float32), conf], axis=-1)
            else:
                mask_in = mask_s
        delta = model.apply({"params": params}, x_s, s_idx, mask_in, cond)
        mse_model = ((delta - target) ** 2).mean()
        mse_zero = (target ** 2).mean()      # "do nothing" baseline
        return mse_model, mse_zero

    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    report = {}
    for s in range(1, levels + 1):
        ms, zs = [], []
        for _ in range(args.num_batches):
            batch = ds.get_batch(rng.randint(0, len(ds), size=args.batch))
            cond = {"occ": jnp.asarray(batch["occ"]),
                    "start_goal": jnp.asarray(batch["start_goal"])}
            if "sdf" in batch and meta.get("use_sdf"):
                cond["sdf"] = jnp.asarray(batch["sdf"])
            key, k = jax.random.split(key)
            m, z = level_error(k, jnp.asarray(batch["x"]), cond, s)
            ms.append(float(m))
            zs.append(float(z))
        report[f"level_{s}"] = {
            "model_mse": float(np.mean(ms)),
            "zero_baseline_mse": float(np.mean(zs)),
            "improvement": float(1.0 - np.mean(ms) / max(np.mean(zs), 1e-12)),
        }
    out = json.dumps(report, indent=2)
    print(out)
    if args.out_json:
        with open(args.out_json, "w") as f:
            f.write(out)
    return report


if __name__ == "__main__":
    main()
