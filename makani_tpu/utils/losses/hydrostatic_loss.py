"""Hydrostatic balance loss (ref makani/utils/losses/hydrostatic_loss.py:25-177).

Penalizes the squared residual of the discrete hydrostatic relation between
geopotential z [m^2/s^2] and temperature T on matched pressure levels:

    r_l = (z_{l+1} - z_l) / R_d + 0.5 ln(p_{l+1}/p_l) (T_l + T_{l+1})

one residual per pressure interval, evaluated in physical units (the
normalization bias/scale is undone first) and fp32: the residual is a
catastrophic cancellation of large geopotential terms. With
``use_moist_air_formula``, T is replaced by the virtual temperature
T (1 + 0.6078 q) using matched specific-humidity channels.

The constraint rows form a dense (n_intervals, C) matrix applied as a single
einsum — the reference's sparse matmul is counterproductive on the MXU.
Returns (B, n_intervals): this loss defines its own channel count, which the
LossHandler picks up via ``n_channels``.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax.numpy as jnp

from .base_loss import GeometricBaseLoss, LossType

__all__ = ["HydrostaticBalanceLoss", "get_matching_channels_pl"]

_R_DRY_AIR = 287.052874247  # [J / kg / K]
_Q_CORRECTION_MOIST_AIR = 0.6078


def get_matching_channels_pl(channel_names, prefix_a: str, prefix_b: str, p_min: float, p_max: float) -> Tuple[List[int], List[int], List[int]]:
    """Indices of pressure-level channels present for BOTH prefixes within
    [p_min, p_max], sorted by pressure (ref utils/constraints.py semantics)."""
    levels = []
    for name in channel_names:
        if name.startswith(prefix_a) and name[len(prefix_a) :].isdigit():
            p = int(name[len(prefix_a) :])
            if p_min <= p <= p_max and f"{prefix_b}{p}" in channel_names:
                levels.append(p)
    levels = sorted(levels)
    a_idx = [channel_names.index(f"{prefix_a}{p}") for p in levels]
    b_idx = [channel_names.index(f"{prefix_b}{p}") for p in levels]
    return a_idx, b_idx, levels


class HydrostaticBalanceLoss(GeometricBaseLoss):
    type = LossType.Deterministic

    def __init__(
        self,
        img_shape,
        crop_shape=None,
        crop_offset=(0, 0),
        channel_names=(),
        grid_type="equiangular",
        bias=None,
        scale=None,
        p_min: float = 0,
        p_max: float = 1000,
        use_moist_air_formula: bool = False,
        **kwargs,
    ):
        super().__init__(img_shape, crop_shape, crop_offset, channel_names, grid_type)
        channel_names = list(channel_names)
        self.use_moist_air_formula = use_moist_air_formula

        self.z_idx, self.t_idx, self.pressures = get_matching_channels_pl(channel_names, "z", "t", p_min, p_max)
        if len(self.pressures) < 2:
            raise ValueError("need at least two matched (z, t) pressure levels inside the limits")
        if use_moist_air_formula:
            self.q_idx, _, p_q = get_matching_channels_pl(channel_names, "q", "t", p_min, p_max)
            if p_q != self.pressures:
                raise ValueError("t, z and q channels must share the same pressure levels")

        C = len(channel_names)
        n = len(self.pressures)
        cmat = np.zeros((n - 1, C), dtype=np.float32)
        for k in range(n - 1):
            dlnp = np.log(self.pressures[k + 1] / self.pressures[k])
            cmat[k, self.z_idx[k]] = -1.0 / _R_DRY_AIR
            cmat[k, self.z_idx[k + 1]] = 1.0 / _R_DRY_AIR
            cmat[k, self.t_idx[k]] = 0.5 * dlnp
            cmat[k, self.t_idx[k + 1]] = 0.5 * dlnp
        self.cmat = cmat

        if bias is not None and scale is not None:
            self.bias = np.asarray(bias, dtype=np.float32).reshape(1, -1, 1, 1)
            self.scale = np.asarray(scale, dtype=np.float32).reshape(1, -1, 1, 1)
        else:
            self.bias = np.zeros((1, C, 1, 1), dtype=np.float32)
            self.scale = np.ones((1, C, 1, 1), dtype=np.float32)

    @property
    def n_channels(self):
        return self.cmat.shape[0]

    def __call__(self, prd, tar, wgt=None, **kwargs):
        prdun = prd.astype(jnp.float32) * jnp.asarray(self.scale) + jnp.asarray(self.bias)
        if self.use_moist_air_formula:
            tv = prdun[:, self.t_idx] * (1.0 + _Q_CORRECTION_MOIST_AIR * prdun[:, self.q_idx])
            prdun = prdun.at[:, self.t_idx].set(tv)
        res = jnp.square(jnp.einsum("kc,bchw->bkhw", jnp.asarray(self.cmat), prdun, precision="highest"))
        if wgt is not None:
            res = res * wgt
        return self.quadrature(res).reshape(prd.shape[0], -1)
