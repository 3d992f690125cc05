"""Per-maze selector accuracy (reference scripts/diagnose_selector_per_maze.py).

Groups a prepared dataset by occupancy-grid hash, runs the trained
KeypointSelector on each maze's samples, and reports index MAE + set overlap
of predicted vs DP-label keypoints, plus the per-maze index histograms —
separates "the selector learned this maze" from "the selector learned a
global prior".
"""
from __future__ import annotations

import argparse
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import PreparedTrajectoryDataset
from ..models.loading import load_selector_model
from ..models.selector import select_topk_indices


def _hash_occ(arr: np.ndarray) -> str:
    return hashlib.sha1(np.ascontiguousarray(arr).tobytes()).hexdigest()


def _index_histogram(idx: np.ndarray, T: int) -> np.ndarray:
    return np.bincount(idx.reshape(-1), minlength=T)


def main(argv=None):
    p = argparse.ArgumentParser("diagnose_selector_per_maze")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--eval_npz", type=str, required=True)
    p.add_argument("--batch_per_maze", type=int, default=256)
    p.add_argument("--max_mazes", type=int, default=3)
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    model, params, meta = load_selector_model(args.ckpt)
    ds = PreparedTrajectoryDataset(args.eval_npz)
    occ = ds.arrays.get("occ")
    if occ is None or occ.ndim == 2 or occ.shape[0] != len(ds):
        print("occ is shared across the dataset or missing — "
              "no per-maze grouping possible.")
        return None

    groups = {}
    for i in range(len(ds)):
        groups.setdefault(_hash_occ(occ[i]), []).append(i)
    maze_keys = sorted(groups, key=lambda k: len(groups[k]), reverse=True)
    maze_keys = maze_keys[: max(1, args.max_mazes)]

    T, K = int(meta["T"]), int(meta.get("K", 8))
    levels = int(meta.get("levels", 3))

    @jax.jit
    def predict(cond):
        logits = model.apply({"params": params}, cond)
        return select_topk_indices(logits, K)

    report = []
    for mi, key in enumerate(maze_keys):
        ids = np.asarray(groups[key])
        B = min(args.batch_per_maze, len(ids))
        chosen = rng.choice(ids, size=B, replace=False)
        batch = ds.get_batch(chosen)
        cond = {"occ": jnp.asarray(batch["occ"]),
                "start_goal": jnp.asarray(batch["start_goal"])}
        if "sdf" in batch and bool(meta.get("use_sdf", 0)):
            cond["sdf"] = jnp.asarray(batch["sdf"])

        # labels: full-sparsity level of the nested masks when stored,
        # otherwise the flat DP kp_idx
        if "kp_mask_levels" in batch:
            true_mask = batch["kp_mask_levels"][:, levels]
            true = np.stack(
                [np.flatnonzero(m)[:K] for m in true_mask], axis=0)
            if bool(meta.get("use_level", 0)):
                lv = (np.full((B, 1), 1.0, np.float32)
                      if meta.get("level_mode", "k_norm") == "s_norm"
                      else np.full((B, 1), K / max(1, T - 1), np.float32))
                cond["level"] = jnp.asarray(lv)
        elif "kp_idx" in batch:
            true = batch["kp_idx"].astype(np.int64)
        else:
            raise ValueError("eval npz has neither kp_mask_levels nor kp_idx")

        pred = np.asarray(predict(cond))
        k_cmp = min(pred.shape[1], true.shape[1])
        mae = float(np.abs(np.sort(pred, 1)[:, :k_cmp]
                           - np.sort(true, 1)[:, :k_cmp]).mean())
        overlap = float(np.mean([
            len(set(pred[i].tolist()) & set(true[i].tolist()))
            / max(1, len(set(true[i].tolist()))) for i in range(B)
        ]))
        h_true = _index_histogram(true, T)
        h_pred = _index_histogram(pred, T)
        top_true = (np.argsort(-h_true[1:-1])[:10] + 1).tolist()
        top_pred = (np.argsort(-h_pred[1:-1])[:10] + 1).tolist()
        print(f"maze[{mi}] n={len(ids)} sample={B} mae={mae:.2f} "
              f"overlap={overlap:.3f}")
        print(f"  top label idx: {top_true}")
        print(f"  top pred  idx: {top_pred}")
        report.append({"n": len(ids), "mae": mae, "overlap": overlap,
                       "top_true": top_true, "top_pred": top_pred})
    return report


if __name__ == "__main__":
    main()
