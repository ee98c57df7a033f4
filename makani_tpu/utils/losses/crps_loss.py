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
points so each rank scores full ensembles (crps_loss.py:372-380). Two paths:

  * GSPMD: the loss is written over the global (B, E, C, H, W) array and
    pjit derives an all-gather of the ensemble dim from the sharding.
  * manual (``crps_ensemble_manual_a2a``): a `shard_map` body all-to-alls
    members against latitude rows, so each device sorts full ensembles on a
    latitude slice — the reference's communication pattern, moving 1/ne of
    the bytes the all-gather does. Selected automatically when the mesh's
    ensemble axis is populated and the padded latitude count divides
    (env MAKANI_MANUAL_ENSEMBLE_A2A=off forces the GSPMD path).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .base_loss import GeometricBaseLoss, LossType, SpectralBaseLoss

__all__ = ["CRPSLoss", "SpectralCRPSLoss", "crps_ensemble", "crps_ensemble_manual_a2a"]


def _abs_sym(x):
    """|x| with a symmetric subgradient: 0 at x == 0 (torch's convention, and
    the one the CRPS member-subgradient cancellation identity needs). JAX's
    lax.abs picks +1 at the kink, which leaks a spurious +1/E per member on
    exactly-tied ensembles."""
    return x * jnp.sign(x)


def _relu0(x):
    """max(x, 0) whose gradient is 0 at the kink (torch relu convention;
    jnp.maximum splits the tie gradient 0.5/0.5)."""
    return jnp.where(x > 0, x, jnp.zeros_like(x))


def _crps_cdf_kernel(obs, forecasts_sorted):
    """CDF-integration CRPS; forecasts_sorted: (E, ...) ascending, obs (...).

    All kernels here take the ensemble on axis 0 (E-first): on TPU a
    minormost ensemble axis of size E tile-pads E -> 128 lanes (a 16x HBM
    blowup at E=8 — the sort's u32 permutation residual alone was 9 GB at
    the 0.5-deg ensemble bench before this layout), while E-first keeps the
    longitude dim minormost and pads nothing."""
    E = forecasts_sorted.shape[0]
    fc = forecasts_sorted

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
    return integral + _relu0(obs - last)


def _rank_coeffs(ranks, ndim):
    """(E,) rank coefficients broadcast against (E, ...) tensors."""
    return ranks.reshape((-1,) + (1,) * (ndim - 1))


def _crps_skillspread(obs, forecasts_sorted, alpha: float):
    """forecasts_sorted: (E, ...) ascending."""
    E = forecasts_sorted.shape[0]
    ranks = jnp.arange(1, E + 1, dtype=forecasts_sorted.dtype)
    coeff = _rank_coeffs(2.0 * ranks - E - 1.0, forecasts_sorted.ndim)
    espread = (
        2.0
        * jnp.mean(coeff * forecasts_sorted, axis=0)
        * (E - 1.0 + alpha)
        / (E * (E - 1.0))
    ) if E > 1 else jnp.zeros_like(obs)
    eskill = jnp.mean(_abs_sym(obs[None] - forecasts_sorted), axis=0)
    return eskill - 0.5 * espread


def _crps_naive_skillspread(obs, forecasts, alpha: float):
    """forecasts: (E, ...) (unsorted is fine — pairwise form)."""
    E = forecasts.shape[0]
    if E > 1:
        diffs = _abs_sym(forecasts[:, None] - forecasts[None, :])
        espread = jnp.sum(diffs, axis=(0, 1)) * (E - 1.0 + alpha) / (E * E * (E - 1.0))
    else:
        espread = 0.0
    eskill = jnp.mean(_abs_sym(obs[None] - forecasts), axis=0)
    return eskill - 0.5 * espread


def _crps_pwm(obs, forecasts_sorted):
    """forecasts_sorted: (E, ...) ascending."""
    E = forecasts_sorted.shape[0]
    ranks = _rank_coeffs(jnp.arange(E, dtype=forecasts_sorted.dtype), forecasts_sorted.ndim)
    beta0 = jnp.mean(forecasts_sorted, axis=0)
    beta1 = jnp.sum(ranks * forecasts_sorted, axis=0) / (E * (E - 1.0)) if E > 1 else beta0 * 0
    eskill = jnp.mean(_abs_sym(obs[None] - forecasts_sorted), axis=0)
    return eskill + beta0 - 2.0 * beta1


def _crps_gauss(obs, forecasts, eps: float):
    """forecasts: (E, ...)."""
    mu = jnp.mean(forecasts, axis=0)
    sigma = jnp.sqrt(jnp.mean(jnp.square(forecasts - mu[None]), axis=0))
    sigma = jnp.maximum(sigma, eps)
    z = (obs - mu) / sigma
    sqrtpi_inv = 1.0 / np.sqrt(np.pi)
    pdf = sqrtpi_inv / np.sqrt(2.0) * jnp.exp(-0.5 * jnp.square(z))
    cdf2m1 = jax.lax.erf(z / np.sqrt(2.0))
    return sigma * (z * cdf2m1 + 2.0 * pdf - sqrtpi_inv)


def crps_ensemble(obs, forecasts, crps_type: str = "skillspread", alpha: float = 1.0, eps: float = 1e-5, ensemble_axis: int = -1):
    """Pointwise CRPS. obs (...), forecasts with the ensemble on
    ``ensemble_axis`` (unsorted). The computation runs E-first (ensemble on
    axis 0) so the spatial minor dim keeps the TPU lane tiling — pass
    ``ensemble_axis=1`` for (B, E, C, H, W) inputs rather than transposing
    the ensemble minormost yourself (see _crps_cdf_kernel docstring)."""
    forecasts = jnp.moveaxis(forecasts, ensemble_axis, 0)
    if crps_type in ("cdf", "skillspread", "probability weighted moment"):
        forecasts = jnp.sort(forecasts, axis=0)
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


def crps_ensemble_manual_a2a(
    obs,
    forecasts,
    quad_weight,
    crps_type: str = "skillspread",
    alpha: float = 1.0,
    eps: float = 1e-5,
):
    """CRPS with the reference's manual ensemble<->spatial transpose
    (ref crps_loss.py:372-380), as a shard_map over the active mesh.

    forecasts: (B, E, C, H, W) with E sharded over "ensemble" and (H, W) over
    ("h", "w"); obs: (B, C, H, W); quad_weight: (H, W) normalized quadrature.
    Each device all-to-alls its member shard against its latitude rows, sorts
    the full ensemble on a latitude slice, quadrature-sums its partial and
    psums. Returns (B, C), replicated. Requires the local padded latitude
    count to divide the ensemble axis size.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from makani_tpu.parallel import mesh as pmesh

    mesh = pmesh.get_mesh()
    ne = mesh.shape["ensemble"]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("batch", None, "h", "w"), P("batch", "ensemble", None, "h", "w"), P("h", "w")),
        out_specs=P("batch", None),
    )
    def body(obs_l, ens_l, qw_l):
        # exchange member shards against latitude rows: (B, El, C, Hl, Wl) ->
        # (B, E, C, Hl/ne, Wl)
        ens_x = jax.lax.all_to_all(ens_l, "ensemble", split_axis=3, concat_axis=1, tiled=True)
        eidx = jax.lax.axis_index("ensemble")
        chunk = obs_l.shape[-2] // ne
        obs_x = jax.lax.dynamic_slice_in_dim(obs_l, eidx * chunk, chunk, axis=-2)
        qw_x = jax.lax.dynamic_slice_in_dim(qw_l, eidx * chunk, chunk, axis=0)
        crps = crps_ensemble(obs_x, ens_x, crps_type, alpha, eps, ensemble_axis=1)
        part = jnp.sum(crps * qw_x, axis=(-2, -1))  # (B, C)
        return jax.lax.psum(part, ("ensemble", "h", "w"))

    return body(obs, forecasts, quad_weight)


class CRPSLoss(GeometricBaseLoss):
    """Quadrature-averaged pointwise CRPS of an ensemble forecast
    (ref crps_loss.py:277-452). Returns (B, C)."""

    type = LossType.Probabilistic

    def __init__(self, img_shape, crop_shape=None, crop_offset=(0, 0), channel_names=(), grid_type="equiangular", crps_type: str = "skillspread", alpha: float = 1.0, eps: float = 1e-5, **kwargs):
        super().__init__(img_shape, crop_shape, crop_offset, channel_names, grid_type)
        self.crps_type = crps_type
        self.alpha = alpha
        self.eps = eps

    def _use_manual_a2a(self, forecasts) -> bool:
        mode = os.environ.get("MAKANI_MANUAL_ENSEMBLE_A2A", "auto")
        if mode == "off":
            return False
        from makani_tpu.parallel import mesh as pmesh

        try:
            mesh = pmesh.get_mesh()
        except Exception:
            return False
        ne = mesh.shape["ensemble"]
        if ne <= 1 or forecasts.shape[1] % ne != 0:
            return False
        # local padded latitude rows must split evenly across ensemble ranks
        h_local = forecasts.shape[-2] // mesh.shape["h"]
        return forecasts.shape[-2] % mesh.shape["h"] == 0 and h_local % ne == 0

    def __call__(self, forecasts, observations, wgt=None, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        if wgt is None and self._use_manual_a2a(forecasts):
            qw = self.quadrature.quad_weight
            if forecasts.shape[-2] > qw.shape[0] or forecasts.shape[-1] > qw.shape[1]:
                qw = np.pad(qw, [(0, forecasts.shape[-2] - qw.shape[0]), (0, forecasts.shape[-1] - qw.shape[1])])
            crps = crps_ensemble_manual_a2a(
                observations, forecasts, jnp.asarray(qw), self.crps_type, self.alpha, self.eps
            )
            return crps.reshape(forecasts.shape[0], -1)
        crps = crps_ensemble(observations, forecasts, self.crps_type, self.alpha, self.eps, ensemble_axis=1)
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

        crps = _crps_naive_skillspread(ob2, jnp.moveaxis(fc2, 1, 0), self.alpha)  # (B, C, L, M, 2)
        crps = jnp.sum(crps, axis=-1)  # sum re+im parts
        crps = crps * jnp.asarray(self.mode_weights)
        return jnp.sum(crps, axis=(-2, -1)).reshape(B, -1)
