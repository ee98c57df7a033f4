"""Gaussian ensemble negative log-likelihood (ref
makani/utils/losses/likelihood_loss.py:30-134).

Fits a Gaussian to the ensemble at each point (biased variance, matching the
reference's correction=0) and scores the observation under it:

    nll = 0.5 * (log sigma^2 + (obs - mu)^2 / sigma^2)

The variance is floored at eps^2 to keep collapsed ensembles finite. The
reference's ensemble<->spatial transpose for EP is replaced by the sharded
global array: GSPMD gathers the ensemble axis where needed.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base_loss import GeometricBaseLoss, LossType

__all__ = ["EnsembleNLLLoss"]


class EnsembleNLLLoss(GeometricBaseLoss):
    type = LossType.Probabilistic

    def __init__(self, img_shape, crop_shape=None, crop_offset=(0, 0), channel_names=(), grid_type="equiangular", eps: float = 1.0e-6, **kwargs):
        super().__init__(img_shape, crop_shape, crop_offset, channel_names, grid_type)
        self.eps = eps

    def __call__(self, forecasts, observations, wgt=None, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        forecasts = forecasts.astype(jnp.float32)
        observations = observations.astype(jnp.float32)

        mu = jnp.mean(forecasts, axis=1)
        sigmasq = jnp.mean(jnp.square(forecasts - mu[:, None]), axis=1)
        sigmasq = jnp.maximum(sigmasq, self.eps**2)

        nll = 0.5 * (jnp.log(sigmasq) + jnp.square(observations - mu) / sigmasq)
        if wgt is not None:
            nll = nll * wgt
        return self.quadrature(nll).reshape(forecasts.shape[0], -1)
