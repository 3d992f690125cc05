"""Procedural maze generation with guaranteed A*-solvable paths.

Parity with reference src/data/maze.py (generate_maze :19, sdf_from_occupancy
:47). Pure numpy host-side; the SDF uses a vectorized L1 distance transform
instead of an all-pairs cdist.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .astar import astar


def _boundary_walls(occ: np.ndarray, start, goal) -> None:
    h, w = occ.shape
    occ[0, :] = 1
    occ[h - 1, :] = 1
    occ[:, 0] = 1
    occ[:, w - 1] = 1
    occ[tuple(start)] = 0
    occ[tuple(goal)] = 0


def generate_maze(
    rng: np.random.RandomState,
    h: int = 21,
    w: int = 21,
    p_wall: float = 0.2,
    min_l1: Optional[int] = None,
    max_tries: int = 100,
):
    """Random occupancy grid + far-apart start/goal + valid A* path."""
    min_l1 = min_l1 or (h // 2)
    for _ in range(max_tries):
        occ = (rng.rand(h, w) < p_wall).astype(np.int32)
        free = np.argwhere(occ == 0)
        if len(free) < 2:
            continue
        start = tuple(free[rng.randint(0, len(free))])
        goal = tuple(free[rng.randint(0, len(free))])
        if abs(start[0] - goal[0]) + abs(start[1] - goal[1]) < min_l1:
            continue
        _boundary_walls(occ, start, goal)
        path = astar(occ, start, goal)
        if path is None:
            continue
        return occ, start, goal, path
    raise RuntimeError("Failed to generate a valid maze with path")


def sdf_from_occupancy(occ: np.ndarray, signed: bool = True) -> np.ndarray:
    """L1 distance to the nearest wall cell, negated inside walls.

    Vectorized two-pass chamfer sweep (O(h·w), vs the reference's O(n²)
    cdist) — identical values for the L1 metric.
    """
    h, w = occ.shape
    INF = np.float32(h + w + 10)
    dist = np.where(occ > 0.5, 0.0, INF).astype(np.float32)
    if (occ > 0.5).sum() == 0:
        return np.zeros((h, w), dtype=np.float32)
    # forward sweep
    for i in range(h):
        for j in range(w):
            if i > 0:
                dist[i, j] = min(dist[i, j], dist[i - 1, j] + 1)
            if j > 0:
                dist[i, j] = min(dist[i, j], dist[i, j - 1] + 1)
    # backward sweep
    for i in range(h - 1, -1, -1):
        for j in range(w - 1, -1, -1):
            if i < h - 1:
                dist[i, j] = min(dist[i, j], dist[i + 1, j] + 1)
            if j < w - 1:
                dist[i, j] = min(dist[i, j], dist[i, j + 1] + 1)
    if signed:
        dist = dist * (1.0 - 2.0 * occ.astype(np.float32))
    return dist
