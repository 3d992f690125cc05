"""Global selector-vs-DP-label accuracy (reference scripts/diagnose_selector.py).

Runs the trained KeypointSelector on a random prepared-dataset batch and
reports predicted-vs-label index MAE, per-sample set overlap, and the most
frequently selected interior indices for labels and predictions — the quick
"did the selector learn anything beyond a global prior" check; the per-maze
breakdown lives in diagnose_selector_per_maze.py.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import PreparedTrajectoryDataset
from ..models.loading import load_selector_model
from ..models.selector import select_topk_indices


def main(argv=None):
    p = argparse.ArgumentParser("diagnose_selector")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--prepared_path", type=str, required=True)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_json", type=str, default=None)
    args = p.parse_args(argv)

    model, params, meta = load_selector_model(args.ckpt)
    ds = PreparedTrajectoryDataset(args.prepared_path)
    T, K = int(meta["T"]), int(meta.get("K", 8))
    levels = int(meta.get("levels", 3))

    rng = np.random.RandomState(args.seed)
    B = min(args.batch, len(ds))
    batch = ds.get_batch(rng.choice(len(ds), size=B, replace=False))

    # labels: top-level kp mask (K anchors) if per-level labels exist, else kp_idx
    if "kp_mask_levels" in batch:
        true_mask = np.asarray(batch["kp_mask_levels"])[:, levels]
        true = np.stack([np.nonzero(m)[0][:K] for m in true_mask])
    else:
        true = np.asarray(batch["kp_idx"])[:, :K]

    cond = {"occ": jnp.asarray(batch["occ"]),
            "start_goal": jnp.asarray(batch["start_goal"])}
    if meta.get("use_sdf") and "sdf" in batch:
        cond["sdf"] = jnp.asarray(batch["sdf"])
    if meta.get("use_level"):
        cond["level"] = jnp.full((B, 1), K / max(1, T - 1))

    predict = jax.jit(
        lambda cond: select_topk_indices(model.apply({"params": params}, cond), K)
    )
    pred = np.asarray(predict(cond))

    true_s = np.sort(true, axis=1)
    pred_s = np.sort(pred, axis=1)
    mae = float(np.abs(pred_s - true_s).mean())
    overlap = float(np.mean([
        len(set(pred[i].tolist()) & set(true[i].tolist())) / max(1, len(true[i]))
        for i in range(B)
    ]))
    hist_true = np.bincount(true.reshape(-1), minlength=T)
    hist_pred = np.bincount(pred.reshape(-1), minlength=T)
    top_true = (np.argsort(-hist_true[1:-1])[:10] + 1).tolist()
    top_pred = (np.argsort(-hist_pred[1:-1])[:10] + 1).tolist()

    print(f"selector mae={mae:.2f} overlap={overlap:.3f} (B={B}, K={K}, T={T})")
    print("top interior label idx:", top_true)
    print("top interior pred  idx:", top_pred)
    report = {"mae": mae, "overlap": overlap, "top_true": top_true,
              "top_pred": top_pred}
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
