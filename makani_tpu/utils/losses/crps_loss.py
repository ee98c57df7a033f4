"""CRPS loss family (ref makani/utils/losses/crps_loss.py:42-1022).

Probabilistic losses for ensemble training. Kernels:

  * "cdf" — piecewise CDF integration over the sorted ensemble (the
    properscoring estimator), expressed as a `lax.scan` over members,
  * "skillspread" — fair CRPS via the sorted-rank spread identity
    (``alpha`` tempers the fairness correction),
  * "naive skillspread" — O(E^2) pairwise form,
  * "probability weighted moment" — Zamo & Naveau PWM estimator,
  * "gauss" — analytic CRPS for a Gaussian fit to the ensemble.

Distribution: the reference all-to-alls ensemble members against spatial
points so each rank scores full ensembles (crps_loss.py:372-380). Here the
loss is written over the global (B, E, C, H, W) array; under pjit, GSPMD
inserts the required gathers from the sharding — with the manual
ensemble<->spatial transpose kept as a later optimization.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .base_loss import GeometricBaseLoss, LossType, SpectralBaseLoss

__all__ = ["CRPSLoss", "SpectralCRPSLoss", "crps_ensemble"]


def _crps_cdf_kernel(obs, forecasts_sorted):
    """CDF-integration CRPS; forecasts_sorted: (..., E) ascending, obs (...)."""
    E = forecasts_sorted.shape[-1]
    fc = jnp.moveaxis(forecasts_sorted, -1, 0)  # (E, ...)

    def body(carry, forecast):
        obs_cdf, forecast_cdf, prev_forecast, integral = carry
        condition = jnp.logical_and(obs < forecast, jnp.abs(obs_cdf) < 1.0e-7)
        term_true = (obs - prev_forecast) * jnp.square(forecast_cdf) + (forecast - obs) * jnp.square(forecast_cdf - 1.0)
        term_false = (forecast - prev_forecast) * jnp.square(forecast_cdf - obs_cdf)
        integral = integral + jnp.where(condition, term_true, term_false)
        obs_cdf = jnp.where(condition, 1.0, obs_cdf)
        forecast_cdf = forecast_cdf + 1.0 / E
        return (obs_cdf, forecast_cdf, forecast, integral), None

    zeros = jnp.zeros_like(obs)
    (obs_cdf, _, last, integral), _ = jax.lax.scan(body, (zeros, zeros, zeros, zeros), fc)
    return integral + jnp.maximum(obs - last, 0.0)


def _crps_skillspread(obs, forecasts_sorted, alpha: float):
    E = forecasts_sorted.shape[-1]
    ranks = jnp.arange(1, E + 1, dtype=forecasts_sorted.dtype)
    espread = (
        2.0
        * jnp.mean((2.0 * ranks - E - 1.0) * forecasts_sorted, axis=-1)
        * (E - 1.0 + alpha)
        / (E * (E - 1.0))
    ) if E > 1 else jnp.zeros_like(obs)
    eskill = jnp.mean(jnp.abs(obs[..., None] - forecasts_sorted), axis=-1)
    return eskill - 0.5 * espread


def _crps_naive_skillspread(obs, forecasts, alpha: float):
    E = forecasts.shape[-1]
    if E > 1:
        diffs = jnp.abs(forecasts[..., :, None] - forecasts[..., None, :])
        espread = jnp.sum(diffs, axis=(-2, -1)) * (E - 1.0 + alpha) / (E * E * (E - 1.0))
    else:
        espread = 0.0
    eskill = jnp.mean(jnp.abs(obs[..., None] - forecasts), axis=-1)
    return eskill - 0.5 * espread


def _crps_pwm(obs, forecasts_sorted):
    E = forecasts_sorted.shape[-1]
    ranks = jnp.arange(E, dtype=forecasts_sorted.dtype)
    beta0 = jnp.mean(forecasts_sorted, axis=-1)
    beta1 = jnp.sum(ranks * forecasts_sorted, axis=-1) / (E * (E - 1.0)) if E > 1 else beta0 * 0
    eskill = jnp.mean(jnp.abs(obs[..., None] - forecasts_sorted), axis=-1)
    return eskill + beta0 - 2.0 * beta1


def _crps_gauss(obs, forecasts, eps: float):
    mu = jnp.mean(forecasts, axis=-1)
    sigma = jnp.sqrt(jnp.mean(jnp.square(forecasts - mu[..., None]), axis=-1))
    sigma = jnp.maximum(sigma, eps)
    z = (obs - mu) / sigma
    sqrtpi_inv = 1.0 / np.sqrt(np.pi)
    pdf = sqrtpi_inv / np.sqrt(2.0) * jnp.exp(-0.5 * jnp.square(z))
    cdf2m1 = jax.lax.erf(z / np.sqrt(2.0))
    return sigma * (z * cdf2m1 + 2.0 * pdf - sqrtpi_inv)


def crps_ensemble(obs, forecasts, crps_type: str = "skillspread", alpha: float = 1.0, eps: float = 1e-5):
    """Pointwise CRPS. obs (...), forecasts (..., E) (unsorted)."""
    if crps_type in ("cdf", "skillspread", "probability weighted moment"):
        forecasts = jnp.sort(forecasts, axis=-1)
    if crps_type == "cdf":
        return _crps_cdf_kernel(obs, forecasts)
    if crps_type == "skillspread":
        return _crps_skillspread(obs, forecasts, alpha)
    if crps_type == "naive skillspread":
        return _crps_naive_skillspread(obs, forecasts, alpha)
    if crps_type == "probability weighted moment":
        return _crps_pwm(obs, forecasts)
    if crps_type == "gauss":
        return _crps_gauss(obs, forecasts, eps)
    raise ValueError(f"Unknown CRPS crps_type {crps_type}")


class CRPSLoss(GeometricBaseLoss):
    """Quadrature-averaged pointwise CRPS of an ensemble forecast
    (ref crps_loss.py:277-452). Returns (B, C)."""

    type = LossType.Probabilistic

    def __init__(self, img_shape, crop_shape=None, crop_offset=(0, 0), channel_names=(), grid_type="equiangular", crps_type: str = "skillspread", alpha: float = 1.0, eps: float = 1e-5, **kwargs):
        super().__init__(img_shape, crop_shape, crop_offset, channel_names, grid_type)
        self.crps_type = crps_type
        self.alpha = alpha
        self.eps = eps

    def __call__(self, forecasts, observations, wgt=None, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        ens_last = jnp.moveaxis(forecasts, 1, -1)  # (B, C, H, W, E)
        crps = crps_ensemble(observations, ens_last, self.crps_type, self.alpha, self.eps)
        if wgt is not None:
            crps = crps * wgt
        return self.quadrature(crps).reshape(forecasts.shape[0], -1)


class SpectralCRPSLoss(SpectralBaseLoss):
    """CRPS over SH coefficient amplitudes (ref crps_loss.py:454-650): the
    naive skillspread kernel applied per (l, m) mode to the split-complex
    coefficient pair, mode-weighted and summed."""

    type = LossType.Probabilistic

    def __init__(self, img_shape, channel_names=(), grid_type="equiangular", crps_type: str = "skillspread", alpha: float = 1.0, eps: float = 1e-5, **kwargs):
        super().__init__(img_shape, channel_names, grid_type)
        self.alpha = alpha
        self.eps = eps

    def __call__(self, forecasts, observations, wgt=None, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        B, E = forecasts.shape[:2]
        fc2 = self.sht.analysis(forecasts.reshape(B * E, *forecasts.shape[2:]).astype(jnp.float32))
        fc2 = fc2.reshape(B, E, *fc2.shape[1:])  # (B, E, C, L, M, 2)
        ob2 = self.sht.analysis(observations.astype(jnp.float32))  # (B, C, L, M, 2)

        ens_last = jnp.moveaxis(fc2, 1, -1)  # (B, C, L, M, 2, E)
        crps = _crps_naive_skillspread(ob2, ens_last, self.alpha)  # (B, C, L, M, 2)
        crps = jnp.sum(crps, axis=-1)  # sum re+im parts
        crps = crps * jnp.asarray(self.mode_weights)
        return jnp.sum(crps, axis=(-2, -1)).reshape(B, -1)
