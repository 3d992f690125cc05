"""Trajectory metrics, batched and jit-friendly.

Parity with reference src/eval/metrics.py: collision_rate (cell lookup + OOB,
:26), goal_distance (:36), success < 1 cell (:42), path_length (:47),
smoothness = mean ‖accel‖ (:52), batched compute_metrics_batch (:68).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def _pos_to_cell(pos: jnp.ndarray, h: int, w: int):
    x, y = pos[..., 0], pos[..., 1]
    oob = (x < 0) | (x > 1) | (y < 0) | (y > 1)
    j = jnp.clip(jnp.round(x * max(w - 1, 1)).astype(jnp.int32), 0, w - 1)
    i = jnp.clip(jnp.round(y * max(h - 1, 1)).astype(jnp.int32), 0, h - 1)
    return i, j, oob


def compute_metrics_batch(
    occ: jnp.ndarray,          # [B, h, w] (or [B, 1, h, w])
    traj: jnp.ndarray,         # [B, T, >=2] (positions in dims 0:2)
    goal: jnp.ndarray,         # [B, 2]
    gt: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    if occ.ndim == 4:
        occ = occ[:, 0]
    pos = traj[..., :2]
    B, T = pos.shape[:2]
    h, w = occ.shape[-2:]
    i, j, oob = _pos_to_cell(pos, h, w)
    b = jnp.arange(B)[:, None]
    coll = (occ[b, i, j] > 0.5) | oob
    collision = coll.astype(jnp.float32).mean(axis=1)

    goal_dist = jnp.linalg.norm(pos[:, -1] - goal, axis=-1)
    success = (goal_dist < (1.0 / float(w))).astype(jnp.float32)
    path_len = jnp.linalg.norm(pos[:, 1:] - pos[:, :-1], axis=-1).sum(axis=1)
    if T < 3:
        smooth = jnp.zeros_like(goal_dist)
    else:
        acc = pos[:, 2:] - 2 * pos[:, 1:-1] + pos[:, :-2]
        smooth = jnp.linalg.norm(acc, axis=-1).mean(axis=1)

    out = {
        "collision_rate": collision,
        "goal_dist": goal_dist,
        "success": success,
        "path_length": path_len,
        "smoothness": smooth,
    }
    if gt is not None:
        out["mse_to_gt"] = ((traj - gt) ** 2).mean(axis=(1, 2))
    return out


def compute_metrics(occ, traj, goal, gt=None) -> Dict[str, float]:
    batch = compute_metrics_batch(
        occ[None] if occ.ndim == 2 else occ,
        traj[None] if traj.ndim == 2 else traj,
        goal[None] if goal.ndim == 1 else goal,
        None if gt is None else (gt[None] if gt.ndim == 2 else gt),
    )
    return {k: float(v[0]) for k, v in batch.items()}
