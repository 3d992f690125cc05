"""Maze / trajectory visualization (host-side matplotlib).

Parity with reference src/eval/visualize.py: occupancy imshow with
trajectory/keypoint overlays (:173), maze2d cell walls (:68), wall polygons
(:121), flip_y handling. All functions take numpy arrays and write PNGs.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_occupancy_trajectories(
    occ: np.ndarray,                      # [H, W] or [1, H, W]
    trajectories: Sequence[np.ndarray],   # each [T, >=2] in [0,1] coords
    labels: Optional[Sequence[str]] = None,
    keypoints: Optional[np.ndarray] = None,   # [K, 2]
    start_goal: Optional[np.ndarray] = None,  # [4]
    out_path: Optional[str] = None,
    flip_y: bool = False,
    title: Optional[str] = None,
):
    occ = np.asarray(occ)
    if occ.ndim == 3:
        occ = occ[0]
    h, w = occ.shape
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(occ, cmap="gray_r", origin="upper",
              extent=(0, 1, 1, 0) if not flip_y else (0, 1, 0, 1))
    colors = plt.cm.tab10.colors
    for i, traj in enumerate(trajectories):
        traj = np.asarray(traj)
        y = traj[:, 1] if not flip_y else 1.0 - traj[:, 1]
        label = labels[i] if labels and i < len(labels) else None
        ax.plot(traj[:, 0], y, "-", color=colors[i % 10], lw=1.5, label=label)
        ax.plot(traj[0, 0], y[0], "o", color=colors[i % 10], ms=5)
    if keypoints is not None:
        kp = np.asarray(keypoints)
        ky = kp[:, 1] if not flip_y else 1.0 - kp[:, 1]
        ax.plot(kp[:, 0], ky, "k^", ms=6, label="keypoints")
    if start_goal is not None:
        sg = np.asarray(start_goal)
        sy = sg[1] if not flip_y else 1.0 - sg[1]
        gy = sg[3] if not flip_y else 1.0 - sg[3]
        ax.plot(sg[0], sy, "g*", ms=14, label="start")
        ax.plot(sg[2], gy, "r*", ms=14, label="goal")
    if labels or keypoints is not None or start_goal is not None:
        ax.legend(loc="upper right", fontsize=7)
    if title:
        ax.set_title(title, fontsize=9)
    ax.set_xlim(0, 1)
    ax.set_ylim((1, 0) if not flip_y else (0, 1))
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    return fig


def plot_wall_polygons(
    walls: Sequence[Tuple[float, float, float, float]],  # (x0, y0, x1, y1) boxes
    trajectories: Sequence[np.ndarray],
    labels: Optional[Sequence[str]] = None,
    bounds: Tuple[Tuple[float, float], Tuple[float, float]] = ((0, 1), (0, 1)),
    out_path: Optional[str] = None,
    title: Optional[str] = None,
):
    """World-coordinate wall boxes + trajectories (MuJoCo-style viz)."""
    fig, ax = plt.subplots(figsize=(5, 5))
    for (x0, y0, x1, y1) in walls:
        ax.add_patch(plt.Rectangle((x0, y0), x1 - x0, y1 - y0,
                                   facecolor="0.3", edgecolor="none"))
    colors = plt.cm.tab10.colors
    for i, traj in enumerate(trajectories):
        traj = np.asarray(traj)
        label = labels[i] if labels and i < len(labels) else None
        ax.plot(traj[:, 0], traj[:, 1], "-", color=colors[i % 10], lw=1.5,
                label=label)
    if labels:
        ax.legend(loc="upper right", fontsize=7)
    ax.set_xlim(*bounds[0])
    ax.set_ylim(*bounds[1])
    ax.set_aspect("equal")
    if title:
        ax.set_title(title, fontsize=9)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    return fig


def save_sample_grid(
    occ_batch: np.ndarray, trajs_by_variant: dict, out_path: str,
    start_goal: Optional[np.ndarray] = None, max_samples: int = 8,
):
    """Grid of per-sample panels, one column per variant."""
    names = list(trajs_by_variant.keys())
    n = min(max_samples, occ_batch.shape[0])
    fig, axes = plt.subplots(n, len(names), figsize=(3 * len(names), 3 * n),
                             squeeze=False)
    for r in range(n):
        occ = occ_batch[r]
        if occ.ndim == 3:
            occ = occ[0]
        for c, name in enumerate(names):
            ax = axes[r][c]
            ax.imshow(occ, cmap="gray_r", origin="upper", extent=(0, 1, 1, 0))
            traj = np.asarray(trajs_by_variant[name][r])
            ax.plot(traj[:, 0], traj[:, 1], "-", lw=1.2)
            if start_goal is not None:
                sg = start_goal[r]
                ax.plot(sg[0], sg[1], "g*", ms=10)
                ax.plot(sg[2], sg[3], "r*", ms=10)
            if r == 0:
                ax.set_title(name, fontsize=9)
            ax.set_xticks([])
            ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
