"""Visualization helpers for trajectories and rollouts.

Counterpart of the reference's data_generation plotting scripts
(data_generation/ draw_*.py / visualization helpers, SURVEY.md §2.2):
render field snapshots and prediction-vs-target rollouts to PNG. matplotlib
is optional; functions no-op with a warning when it is absent.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def plot_trajectory(
    traj: np.ndarray,
    path: str,
    channel: int = 0,
    times: Optional[Sequence[int]] = None,
    title: str = "",
) -> bool:
    """traj: (H, W, T, C) -> grid of snapshots."""
    plt = _plt()
    if plt is None:
        print("viz: matplotlib unavailable, skipping", path)
        return False
    traj = np.asarray(traj)
    T = traj.shape[-2]
    times = list(times if times is not None else np.linspace(0, T - 1, min(T, 6)).astype(int))
    fig, axes = plt.subplots(1, len(times), figsize=(3 * len(times), 3))
    if len(times) == 1:
        axes = [axes]
    for ax, t in zip(axes, times):
        im = ax.imshow(traj[..., t, channel], cmap="RdBu_r")
        ax.set_title(f"t={t}")
        ax.axis("off")
        fig.colorbar(im, ax=ax, fraction=0.046)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return True


def plot_rollout_comparison(
    pred: np.ndarray,
    target: np.ndarray,
    path: str,
    channel: int = 0,
    times: Optional[Sequence[int]] = None,
) -> bool:
    """pred/target: (H, W, T, C) -> 3 rows: target / prediction / error."""
    plt = _plt()
    if plt is None:
        print("viz: matplotlib unavailable, skipping", path)
        return False
    pred, target = np.asarray(pred), np.asarray(target)
    T = pred.shape[-2]
    times = list(times if times is not None else np.linspace(0, T - 1, min(T, 5)).astype(int))
    fig, axes = plt.subplots(3, len(times), figsize=(3 * len(times), 9))
    rows = [target, pred, pred - target]
    labels = ["target", "prediction", "error"]
    for r, (row, lbl) in enumerate(zip(rows, labels)):
        for c, t in enumerate(times):
            ax = axes[r][c] if len(times) > 1 else axes[r]
            im = ax.imshow(row[..., t, channel], cmap="RdBu_r")
            ax.axis("off")
            if c == 0:
                ax.set_ylabel(lbl)
            ax.set_title(f"{lbl} t={t}", fontsize=8)
            fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return True
