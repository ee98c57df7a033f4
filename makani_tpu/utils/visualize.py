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

__all__ = [
    "plot_field",
    "plot_comparison",
    "plot_rollout_curves",
    "windspeed",
    "render_rollout_video",
    "VisualizationWrapper",
]


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


def render_rollout_video(frames: np.ndarray, path: str, title: str = "", cmap: str = "twilight_shifted", fps: int = 4):
    """Render a (T, H, W) rollout to an animated GIF (ref visualize.py video
    renderers; wandb upload replaced by a file)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    fig, ax = plt.subplots(figsize=(8, 4))
    vmin, vmax = float(frames.min()), float(frames.max())
    im = ax.imshow(frames[0], cmap=cmap, vmin=vmin, vmax=vmax, aspect="auto")
    ax.set_xticks([])
    ax.set_yticks([])

    def update(i):
        im.set_data(frames[i])
        ax.set_title(f"{title} step {i}".strip())
        return (im,)

    anim = FuncAnimation(fig, update, frames=frames.shape[0], blit=False)
    anim.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return path


class VisualizationWrapper:
    """Async rendering pool (ref visualize.py:32-120 multiprocess workers):
    plot/video jobs run on background threads so the train loop never blocks
    on matplotlib. ``finalize()`` drains outstanding jobs."""

    def __init__(self, path: str, channel_names: Sequence[str], max_workers: int = 2):
        import concurrent.futures
        import os

        os.makedirs(path, exist_ok=True)
        self.path = path
        self.channel_names = list(channel_names)
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=max_workers)
        self._jobs = []

    def _submit(self, fn, *args, **kwargs):
        self._jobs.append(self._pool.submit(fn, *args, **kwargs))

    def add_comparison(self, pred, target, channel: str, tag: str = ""):
        import os

        c = self.channel_names.index(channel)
        out = os.path.join(self.path, f"{tag or 'compare'}_{channel}.png")
        self._submit(plot_comparison, np.asarray(pred)[c], np.asarray(target)[c], title=channel, path=out)

    def add_video(self, rollout, channel: str, tag: str = ""):
        import os

        c = self.channel_names.index(channel)
        out = os.path.join(self.path, f"{tag or 'rollout'}_{channel}.gif")
        self._submit(render_rollout_video, np.asarray(rollout)[:, c], out, title=channel)

    def finalize(self, timeout: float = 120.0):
        done = []
        for job in self._jobs:
            done.append(job.result(timeout=timeout))
        self._jobs = []
        self._pool.shutdown(wait=True)
        return done


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
