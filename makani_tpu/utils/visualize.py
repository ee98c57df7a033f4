"""Visualization (ref makani/utils/visualize.py:32-393).

Matplotlib rendering of global fields, prediction/target comparisons and
rollout metric curves. The reference drives a multiprocess worker pool for
wandb videos; here rendering is a plain function API the trainer or notebooks
call (files or figures), with derived-quantity functors (windspeed) like the
reference's channel plots.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["plot_field", "plot_comparison", "plot_rollout_curves", "windspeed"]


def windspeed(fields: np.ndarray, channel_names: Sequence[str], level: str = "10m") -> np.ndarray:
    """sqrt(u^2 + v^2) for a named level (ref visualize.py functors)."""
    iu = list(channel_names).index(f"u{level}")
    iv = list(channel_names).index(f"v{level}")
    return np.sqrt(fields[..., iu, :, :] ** 2 + fields[..., iv, :, :] ** 2)


def plot_field(field: np.ndarray, title: str = "", path: Optional[str] = None, cmap: str = "twilight_shifted", projection=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 4.5))
    im = ax.imshow(field, cmap=cmap, aspect="auto")
    ax.set_title(title)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.colorbar(im, ax=ax, shrink=0.8)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def plot_comparison(pred: np.ndarray, target: np.ndarray, title: str = "", path: Optional[str] = None, cmap: str = "twilight_shifted"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(16, 4))
    vmin, vmax = target.min(), target.max()
    for ax, data, name in zip(axes, [pred, target, pred - target], ["prediction", "target", "error"]):
        im = ax.imshow(data, cmap=cmap if name != "error" else "RdBu_r", vmin=vmin if name != "error" else None, vmax=vmax if name != "error" else None, aspect="auto")
        ax.set_title(f"{title} {name}".strip())
        ax.set_xticks([])
        ax.set_yticks([])
        fig.colorbar(im, ax=ax, shrink=0.8)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def plot_rollout_curves(curves: dict, channel_names: Sequence[str], channels: Optional[Sequence[str]] = None, dhours: int = 6, path: Optional[str] = None):
    """Plot per-channel rollout metric curves: curves[metric] is (steps, C)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    channels = channels or list(channel_names)[: min(4, len(channel_names))]
    idx = [list(channel_names).index(c) for c in channels]

    n = len(curves)
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 4), squeeze=False)
    for ax, (metric, curve) in zip(axes[0], curves.items()):
        lead = np.arange(1, curve.shape[0] + 1) * dhours
        for c, name in zip(idx, channels):
            ax.plot(lead, curve[:, c], label=name)
        ax.set_xlabel("lead time [h]")
        ax.set_title(metric)
        ax.grid(alpha=0.3)
        ax.legend()
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig
