"""CRPS losses in derivative spaces (ref makani/utils/losses/crps_loss.py:640-1022
and base_loss.py GradientBaseLoss/VortDivBaseLoss).

``GradientCRPSLoss`` — scores the (scaled) surface gradient of every channel:
the scalar SH coefficients are synthesized through the inverse *vector* SHT
with zero toroidal part, yielding grad (-Lap)^(-1/2) f (each degree's gradient
divided by sqrt(l(l+1)), so all scales contribute comparably). CRPS is then
computed either on the gradient magnitude (``absolute=True``) or on the two
components separately (doubling the channel count).

``VortDivCRPSLoss`` — projects each (u, v) wind pair through the vector SHT
round-trip, i.e. onto the resolvable spheroidal/toroidal (divergence/vorticity)
tangent basis, and scores all channels pointwise with CRPS; non-wind channels
pass through unchanged.

The reference's ensemble<->spatial all-to-all is replaced by the sharded
global (B, E, C, H, W) array under pjit.
"""

from __future__ import annotations

import jax.numpy as jnp

from makani_tpu.ops.sht import RealSHT
from makani_tpu.ops.vector_sht import InverseRealVectorSHT, RealVectorSHT
from makani_tpu.utils.features import get_wind_channels
from makani_tpu.utils.grids import GridQuadrature, grid_to_quadrature_rule

from .base_loss import LossType
from .crps_loss import crps_ensemble

__all__ = ["GradientCRPSLoss", "VortDivCRPSLoss"]


class GradientCRPSLoss:
    type = LossType.Probabilistic

    def __init__(
        self,
        img_shape,
        crop_shape=None,
        crop_offset=(0, 0),
        channel_names=(),
        grid_type="equiangular",
        lmax=None,
        crps_type: str = "skillspread",
        absolute: bool = True,
        alpha: float = 1.0,
        eps: float = 1.0e-6,
        **kwargs,
    ):
        self.channel_names = list(channel_names)
        self.absolute = absolute
        self.crps_type = crps_type
        self.alpha = alpha
        self.eps = eps
        self.sht = RealSHT(img_shape[0], img_shape[1], lmax=lmax, mmax=lmax, grid=grid_type)
        self.ivsht = InverseRealVectorSHT(img_shape[0], img_shape[1], lmax=self.sht.lmax, mmax=self.sht.mmax, grid=grid_type)
        self.quadrature = GridQuadrature(grid_to_quadrature_rule(grid_type), img_shape=img_shape, crop_shape=crop_shape, crop_offset=crop_offset, normalize=True)

    @property
    def n_channels(self):
        return len(self.channel_names) if self.absolute else 2 * len(self.channel_names)

    def _gradient(self, x):
        """(..., C, H, W) -> (..., C or 2C, H, W): scaled surface gradient."""
        c2 = self.sht.analysis(x.astype(jnp.float32))  # (..., C, L, M, 2)
        c2 = jnp.stack([c2, jnp.zeros_like(c2)], axis=-4)  # zero toroidal part
        g = self.ivsht.synthesis(c2)  # (..., C, 2, H, W)
        if self.absolute:
            # eps keeps the gradient finite where the field is locally constant
            return jnp.sqrt(jnp.sum(jnp.square(g), axis=-3) + self.eps**2)
        return g.reshape(*g.shape[:-4], -1, *g.shape[-2:])

    def __call__(self, forecasts, observations, wgt=None, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        fc = self._gradient(forecasts)
        ob = self._gradient(observations)
        crps = crps_ensemble(ob, fc, self.crps_type, self.alpha, self.eps, ensemble_axis=1)
        if wgt is not None:
            crps = crps * wgt
        return self.quadrature(crps).reshape(forecasts.shape[0], -1)


class VortDivCRPSLoss:
    type = LossType.Probabilistic

    def __init__(
        self,
        img_shape,
        crop_shape=None,
        crop_offset=(0, 0),
        channel_names=(),
        grid_type="equiangular",
        lmax=None,
        crps_type: str = "skillspread",
        alpha: float = 1.0,
        eps: float = 1.0e-6,
        **kwargs,
    ):
        self.channel_names = list(channel_names)
        self.crps_type = crps_type
        self.alpha = alpha
        self.eps = eps
        self.wind_chans = get_wind_channels(self.channel_names)
        if len(self.wind_chans) == 0:
            raise ValueError("VortDivCRPSLoss needs at least one (u, v) wind channel pair")
        self.vsht = RealVectorSHT(img_shape[0], img_shape[1], lmax=lmax, mmax=lmax, grid=grid_type)
        self.ivsht = InverseRealVectorSHT(img_shape[0], img_shape[1], lmax=self.vsht.lmax, mmax=self.vsht.mmax, grid=grid_type)
        self.quadrature = GridQuadrature(grid_to_quadrature_rule(grid_type), img_shape=img_shape, crop_shape=crop_shape, crop_offset=crop_offset, normalize=True)

    @property
    def n_channels(self):
        return len(self.channel_names)

    def _project_wind(self, x):
        """Round-trip the (u, v) pairs through the vector SHT (projection onto
        the resolvable tangent-harmonic basis); scalars pass through."""
        idx = self.wind_chans
        shape = x.shape
        wind = x[..., idx, :, :].astype(jnp.float32)
        wind = wind.reshape(*shape[:-3], len(idx) // 2, 2, *shape[-2:])
        wind = self.ivsht.synthesis(self.vsht.analysis(wind))
        wind = wind.reshape(*shape[:-3], len(idx), *shape[-2:])
        return x.astype(jnp.float32).at[..., idx, :, :].set(wind)

    def __call__(self, forecasts, observations, wgt=None, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        fc = self._project_wind(forecasts)
        ob = self._project_wind(observations)
        crps = crps_ensemble(ob, fc, self.crps_type, self.alpha, self.eps, ensemble_axis=1)
        if wgt is not None:
            crps = crps * wgt
        return self.quadrature(crps).reshape(forecasts.shape[0], -1)
