"""Gaussian maximum mean discrepancy loss (ref
makani/utils/losses/mmd_loss.py:30-219; Dziugaite et al., arXiv:1505.03906).

MMD between the ensemble distribution and the (point-mass) observation under
a Gaussian kernel applied to quadrature-reduced distances:

    d_skill(e)     = <|obs - f_e|^beta>        (spatial quadrature mean)
    d_spread(e,e') = <|f_e - f_e'|^beta>
    loss = mean_e k(d_skill) - 0.5 * fair-mean_{e != e'} k(d_spread),
    k(d) = exp(-d^2 / (2 sigma))

with the (E - 1 + alpha)/(E^2 (E-1)) fairness factor on the spread term as in
the CRPS skill/spread estimators. NaNs in either field are masked out of the
spatial reduction. The reference's ensemble-direction transpose is replaced
by the sharded global array (GSPMD inserts the gathers).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base_loss import GeometricBaseLoss, LossType

__all__ = ["GaussianMMDLoss"]


class GaussianMMDLoss(GeometricBaseLoss):
    type = LossType.Probabilistic

    def __init__(
        self,
        img_shape,
        crop_shape=None,
        crop_offset=(0, 0),
        channel_names=(),
        grid_type="equiangular",
        sigma: float = 1.0,
        alpha: float = 1.0,
        beta: float = 2.0,
        channel_reduction: bool = False,
        **kwargs,
    ):
        super().__init__(img_shape, crop_shape, crop_offset, channel_names, grid_type)
        self.sigma = sigma
        self.alpha = alpha
        self.beta = beta
        self.channel_reduction = channel_reduction

    @property
    def n_channels(self):
        return 1 if self.channel_reduction else len(self.channel_names)

    def __call__(self, forecasts, observations, wgt=None, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        B, E = forecasts.shape[:2]
        forecasts = forecasts.astype(jnp.float32)
        observations = observations.astype(jnp.float32)[:, None]  # (B, 1, C, H, W)

        # joint nan mask (any member or the observation missing at a point)
        nanmask = jnp.isnan(observations) | jnp.any(jnp.isnan(forecasts), axis=1, keepdims=True)
        observations = jnp.where(jnp.isnan(observations), 0.0, observations)
        forecasts = jnp.where(jnp.isnan(forecasts), 0.0, forecasts)

        def reduce(d):
            # the pairwise spread tensor is 6-D (B, E, E, C, H, W); insert a
            # pair axis into the (B, 1, C, H, W) mask/weight so broadcasting
            # aligns on the batch dim instead of silently requiring B == E
            m = nanmask[:, :, None] if d.ndim == 6 else nanmask
            d = jnp.where(m, 0.0, d)
            if wgt is not None:
                wg = jnp.asarray(wgt)
                if d.ndim == 6 and wg.ndim == 5:
                    wg = wg[:, :, None]
                d = d * wg
            d = self.quadrature(d)
            if self.channel_reduction:
                d = jnp.sum(d, axis=-1, keepdims=True)
            return d

        eskill = reduce(jnp.power(jnp.abs(observations - forecasts), self.beta))  # (B, E, C')
        espread = reduce(
            jnp.power(jnp.abs(forecasts[:, :, None] - forecasts[:, None, :]), self.beta)
        )  # (B, E, E, C')

        kskill = jnp.exp(-0.5 * jnp.square(eskill) / self.sigma)
        kspread = jnp.exp(-0.5 * jnp.square(espread) / self.sigma)
        # zero the diagonal (self-pairs)
        eye = jnp.eye(E, dtype=bool)[None, :, :, None]
        kspread = jnp.where(eye, 0.0, kspread)

        skill_term = jnp.sum(kskill, axis=1) / float(E)
        if E > 1:
            spread_term = jnp.sum(kspread, axis=(1, 2)) * (E - 1.0 + self.alpha) / float(E * E * (E - 1))
        else:
            spread_term = jnp.zeros_like(skill_term)

        return (skill_term - 0.5 * spread_term).reshape(B, -1)
