"""Physical output constraints (ref makani/utils/constraints.py:27-348).

``NonNegativeConstraint`` — smooth (training) / hard (eval) clamping of a
named channel subset at physical zero, honoring the z-score normalization
offset (physical zero sits at x_norm = -bias/scale).

``HydrostaticBalanceProjection`` — softly projects the (z, t) pressure-level
sub-state onto the discrete hydrostatic-balance manifold. The discrete
relation between geopotential and temperature,

    z_{l+1} - z_l = -(R_d / g) * (T_l + T_{l+1}) / 2 * ln(p_{l+1} / p_l),

is linear in the physical (z, T) stack, A [z; T] = 0, so the projection is a
precomputed matrix P = I - A^T (A A^T)^{-1} A applied pointwise in physical
units and blended with strength ``alpha``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["NonNegativeConstraint", "HydrostaticBalanceProjection"]

_RD = 287.0528  # gas constant of dry air [J / kg / K]
_G = 9.80665  # gravity [m / s^2]


class NonNegativeConstraint:
    def __init__(self, channel_names, names_to_clamp, bias=None, scale=None, eps: float = 0.1, mode: str = "silu", leak: float = 0.02):
        if mode not in ("silu", "softplus"):
            raise ValueError(f"mode must be 'silu' or 'softplus', got {mode!r}")
        self.eps = eps
        self.mode = mode
        self.leak = leak
        self.channel_indices = np.asarray([channel_names.index(n) for n in names_to_clamp if n in channel_names])
        if self.channel_indices.size == 0:
            raise ValueError(f"none of {names_to_clamp} found in channel_names")
        if bias is not None and scale is not None:
            offs = (np.asarray(bias).reshape(-1)[self.channel_indices] / np.asarray(scale).reshape(-1)[self.channel_indices])
            self.offset = offs.reshape(1, -1, 1, 1).astype(np.float32)
        else:
            self.offset = None

    def __call__(self, x, train: bool = True):
        idx = self.channel_indices
        w = x[:, idx]
        offset = jnp.asarray(self.offset, x.dtype) if self.offset is not None else None
        if train:
            ws = w + offset if offset is not None else w
            if self.mode == "silu":
                ws = ws * jax.nn.sigmoid(ws / self.eps)
            else:
                ws = self.leak * ws + (1.0 - self.leak) * self.eps * (jax.nn.softplus(ws / self.eps) - np.log(2.0))
            w = ws - offset if offset is not None else ws
        else:
            lo = -offset if offset is not None else 0.0
            w = jnp.maximum(w, lo)
        return x.at[:, idx].set(w.astype(x.dtype))


class HydrostaticBalanceProjection:
    def __init__(self, channel_names: Sequence[str], bias=None, scale=None, p_min: float = 50, p_max: float = 900, alpha: float = 1.0):
        # collect matched (z, t) pressure levels within [p_min, p_max]
        levels = []
        for name in channel_names:
            if name.startswith("z") and name[1:].isdigit():
                p = int(name[1:])
                if p_min <= p <= p_max and f"t{p}" in channel_names:
                    levels.append(p)
        levels = sorted(levels)
        if len(levels) < 2:
            raise ValueError("hydrostatic balance needs at least two matched (z, t) levels")
        self.levels = levels
        self.alpha = alpha

        z_idx = [channel_names.index(f"z{p}") for p in levels]
        t_idx = [channel_names.index(f"t{p}") for p in levels]
        self.sub_idx = np.asarray(z_idx + t_idx)

        n = len(levels)
        # A [z; T] = 0 rows: z_{l+1} - z_l + (R_d/g) ln(p_{l+1}/p_l) (T_l + T_{l+1})/2 = 0
        A = np.zeros((n - 1, 2 * n))
        for l in range(n - 1):
            dlnp = np.log(levels[l + 1] / levels[l])
            A[l, l] = -1.0
            A[l, l + 1] = 1.0
            A[l, n + l] = 0.5 * (_RD / _G) * dlnp
            A[l, n + l + 1] = 0.5 * (_RD / _G) * dlnp
        P = np.eye(2 * n) - A.T @ np.linalg.solve(A @ A.T, A)
        self.P = P.astype(np.float32)

        if bias is not None and scale is not None:
            b = np.asarray(bias).reshape(-1)[self.sub_idx].astype(np.float32)
            s = np.asarray(scale).reshape(-1)[self.sub_idx].astype(np.float32)
        else:
            b = np.zeros(2 * n, np.float32)
            s = np.ones(2 * n, np.float32)
        self.sub_bias = b.reshape(1, -1, 1, 1)
        self.sub_scale = s.reshape(1, -1, 1, 1)

    def __call__(self, x, train: bool = True):
        sub = x[:, self.sub_idx].astype(jnp.float32)
        phys = sub * jnp.asarray(self.sub_scale) + jnp.asarray(self.sub_bias)
        proj = jnp.einsum("ij,bjhw->bihw", jnp.asarray(self.P), phys)
        blended = (1.0 - self.alpha) * phys + self.alpha * proj
        sub_new = (blended - jnp.asarray(self.sub_bias)) / jnp.asarray(self.sub_scale)
        return x.at[:, self.sub_idx].set(sub_new.astype(x.dtype))
