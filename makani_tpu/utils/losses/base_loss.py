"""Loss base classes and channel weighting
(ref makani/utils/losses/base_loss.py:38-585).

Losses are plain callables returning per-(sample, channel) values of shape
``(B, C)`` (or ``(B, (n_future+1)*C)`` for multistep targets); the
LossHandler owns channel/multistep weighting and the final reduction. Under
pjit the quadrature sums reduce over sharded spatial dims automatically — the
reference's explicit "spatial" all-reduce disappears.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from makani_tpu.ops.sht import RealSHT
from makani_tpu.utils.grids import GridQuadrature, grid_to_quadrature_rule

__all__ = ["LossType", "compute_channel_weighting", "GeometricBaseLoss", "SpectralBaseLoss"]


class LossType:
    Deterministic = 1
    Probabilistic = 2


def compute_alpha_per_step(
    n_future: int,
    schedule: str = "linear",
    alpha_min: float = 0.0,
    alpha_max: float = 1.0,
    training_progress: Optional[float] = None,
    annealing: str = "quadratic",
    sigmoid_t0_frac: Optional[float] = None,
    sigmoid_beta: float = 5.0,
) -> np.ndarray:
    """Per-lead-step spread weight alpha for tempered energy scores
    (ref base_loss.py:249-288): late rollout steps get more spread reward,
    optionally annealed in by training progress."""
    n_steps = n_future + 1
    k = np.arange(n_steps, dtype=np.float32)
    if schedule == "linear":
        if n_steps <= 1:
            alpha = np.full((n_steps,), alpha_max, np.float32)
        else:
            alpha = alpha_min + (alpha_max - alpha_min) * (k / (n_steps - 1))
    elif schedule == "sigmoid":
        t0 = sigmoid_t0_frac if sigmoid_t0_frac is not None else 0.5
        t_norm = k / max(n_steps - 1, 1) - t0
        alpha = alpha_max / (1.0 + np.exp(-sigmoid_beta * t_norm))
    else:
        alpha = np.full((n_steps,), alpha_max, np.float32)
    if training_progress is not None:
        g = training_progress**2 if annealing == "quadratic" else training_progress
        alpha = alpha * g
    return alpha.astype(np.float32)


def _pangu_weight(name: str) -> float:
    """Per-variable weights from the Pangu-Weather paper (rule-based)."""
    table = {"u10m": 0.77, "v10m": 0.66, "t2m": 3.0, "msl": 1.5}
    if name in table:
        return table[name]
    rules = {"u": 0.77, "v": 0.54, "t": 1.5, "z": 3.0, "q": 0.6}
    return rules.get(name[0], 1.0)


def compute_channel_weighting(channel_names: List[str], channel_weight_type: str = "constant", time_diff_scale: Optional[np.ndarray] = None) -> np.ndarray:
    """Per-channel weights, normalized to sum to one, optionally multiplied by
    the time-difference scale (ref base_loss.py:38-240)."""
    w = np.ones(len(channel_names), dtype=np.float64)

    if channel_weight_type == "constant":
        pass
    elif channel_weight_type in ("auto", "new auto"):
        for c, chn in enumerate(channel_names):
            if chn in ("u10m", "v10m", "u100m", "v100m", "tp", "sp", "msl", "tcwv", "sst"):
                w[c] = 0.1
            elif chn in ("t2m", "2d"):
                w[c] = 1.0 if channel_weight_type == "auto" else 2.0
            elif chn[0] in ("z", "u", "v", "t", "r", "q"):
                plvl = float(chn[1:])
                w[c] = 0.001 * plvl if channel_weight_type == "auto" else max(0.3, 0.001 * plvl)
            else:
                w[c] = 0.01
    elif channel_weight_type == "pangu":
        for c, chn in enumerate(channel_names):
            w[c] = _pangu_weight(chn)
    else:
        raise NotImplementedError(f"Unknown channel weighting type {channel_weight_type}")

    w = w / w.sum()
    if time_diff_scale is not None:
        w = w * np.asarray(time_diff_scale, dtype=np.float64)
    return w.astype(np.float32)


class GeometricBaseLoss:
    """Quadrature-weighted loss base (ref base_loss.py:291-345)."""

    def __init__(self, img_shape, crop_shape=None, crop_offset=(0, 0), channel_names=(), grid_type="equiangular", **kwargs):
        self.img_shape = tuple(img_shape)
        self.channel_names = list(channel_names)
        self.quadrature = GridQuadrature(
            grid_to_quadrature_rule(grid_type),
            img_shape=img_shape,
            crop_shape=crop_shape,
            crop_offset=crop_offset,
            normalize=True,
        )

    type = LossType.Deterministic

    @property
    def n_channels(self):
        return len(self.channel_names)


class SpectralBaseLoss:
    """SH-coefficient-space loss base (ref base_loss.py:345-430).

    The per-mode weights m>0 are doubled (one-sided real spectrum carries both
    +m and -m energy); Parseval then makes the spectral L2 equal the geometric
    L2 for band-limited fields.
    """

    def __init__(self, img_shape, channel_names=(), grid_type="equiangular", lmax=None, mmax=None, **kwargs):
        self.img_shape = tuple(img_shape)
        self.channel_names = list(channel_names)
        self.sht = RealSHT(img_shape[0], img_shape[1], lmax=lmax, mmax=mmax, grid=grid_type)
        mw = np.full((self.sht.mmax,), 2.0, dtype=np.float32)
        mw[0] = 1.0
        self.mode_weights = mw.reshape(1, 1, 1, -1)

    type = LossType.Deterministic

    @property
    def n_channels(self):
        return len(self.channel_names)

    def spectrum_sq(self, x):
        """|f_lm|^2 with one-sided doubling: (B, C, L, M) real (split-complex
        analysis; no complex dtype on device)."""
        c2 = self.sht.analysis(x.astype(jnp.float32))
        return (jnp.square(c2[..., 0]) + jnp.square(c2[..., 1])) * jnp.asarray(self.mode_weights)
