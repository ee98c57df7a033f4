"""Energy scores for ensemble forecasts (ref makani/utils/losses/
energy_score.py:30-655).

The energy score is the multivariate generalization of CRPS,

    ES(X, y) = E ||X - y||^beta - 0.5 * fair-E ||X - X'||^beta

with the fairness factor (E - 1 + alpha)/(E^2 (E - 1)) on the pairwise spread
term. Three norm families:

  * ``LpEnergyScoreLoss`` — quadrature-weighted spatial Lp norm per channel
    (or summed over channels with ``channel_reduction``); optional spread
    tempering by lead time (``spread_temper_steps``).
  * ``SobolevEnergyScoreLoss`` — spectral norm weighted by
    ``(offset + relative_weight * l (l+1))^fraction`` — an H^s Sobolev norm
    interpolating between L2 (fraction=0) and H1 (fraction=1).
  * ``SpectralL2EnergyScoreLoss`` — plain Parseval L2 in coefficient space
    (Sobolev with fraction=0), kept as its own registry entry for parity.

Values below ``eps`` are masked to zero through the fractional powers so the
score and its gradient stay finite on collapsed ensembles.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .base_loss import GeometricBaseLoss, LossType, SpectralBaseLoss

__all__ = ["EnergyScoreLoss", "LpEnergyScoreLoss", "SobolevEnergyScoreLoss", "SpectralL2EnergyScoreLoss"]


def _safe_frac_pow(x, expo, eps):
    """x^expo with values below eps mapped to 0 (finite gradients at 0)."""
    mask = x < eps
    y = jnp.power(jnp.where(mask, eps, x), expo)
    return jnp.where(mask, 0.0, y)


def _fair_spread_sum(pair_sum, E, alpha):
    """Combine the sum over unordered pairs into the fair spread term."""
    if E > 1:
        return pair_sum * 2.0 * (E - 1.0 + alpha) / float(E * E * (E - 1))
    return jnp.zeros_like(pair_sum)


class LpEnergyScoreLoss(GeometricBaseLoss):
    type = LossType.Probabilistic

    def __init__(
        self,
        img_shape,
        crop_shape=None,
        crop_offset=(0, 0),
        channel_names=(),
        grid_type="equiangular",
        p: float = 2.0,
        alpha: float = 1.0,
        beta: float = 1.0,
        channel_reduction: bool = False,
        spread_temper_steps: int = 0,
        eps: float = 1e-6,
        **kwargs,
    ):
        super().__init__(img_shape, crop_shape, crop_offset, channel_names, grid_type)
        self.p = float(p)
        self.alpha = alpha
        self.beta = beta
        self.channel_reduction = channel_reduction
        self.spread_temper_steps = spread_temper_steps
        self.eps = eps

    @property
    def n_channels(self):
        return 1 if self.channel_reduction else len(self.channel_names)

    def _pnorm_beta(self, diff):
        """||diff||_p^beta per (batch..., channel): quadrature mean of |.|^p,
        then the fractional power (1/p) * beta with the eps guard."""
        red = self.quadrature(jnp.power(jnp.abs(diff), self.p))
        if self.channel_reduction:
            red = jnp.sum(red, axis=-1, keepdims=True)
        return _safe_frac_pow(red, self.beta / self.p, self.eps)

    def __call__(self, forecasts, observations, wgt=None, lead_time_step=None, train: bool = True, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        B, E = forecasts.shape[:2]
        forecasts = jnp.where(jnp.isnan(forecasts), 0.0, forecasts.astype(jnp.float32))
        observations = jnp.where(jnp.isnan(observations), 0.0, observations.astype(jnp.float32))

        skill = jnp.mean(self._pnorm_beta(forecasts - observations[:, None]), axis=1)

        if E > 1:
            iu, ju = np.triu_indices(E, k=1)
            pair = self._pnorm_beta(forecasts[:, iu] - forecasts[:, ju])  # (B, P, C')
            spread = _fair_spread_sum(jnp.sum(pair, axis=1), E, self.alpha)
        else:
            spread = jnp.zeros_like(skill)

        if train and self.spread_temper_steps > 0 and lead_time_step is not None:
            scale = jnp.asarray(lead_time_step, jnp.float32) / self.spread_temper_steps
            spread = spread * jnp.maximum(scale, 1.0)

        return (skill - 0.5 * spread).reshape(B, -1)


# backwards-compatible alias (p=2 with fair spread)
EnergyScoreLoss = LpEnergyScoreLoss


class SobolevEnergyScoreLoss(SpectralBaseLoss):
    type = LossType.Probabilistic

    def __init__(
        self,
        img_shape,
        channel_names=(),
        grid_type="equiangular",
        lmax=None,
        alpha: float = 1.0,
        beta: float = 1.0,
        offset: float = 1.0,
        fraction: float = 1.0,
        relative_weight: float = 1.0,
        channel_reduction: bool = True,
        eps: float = 1e-6,
        **kwargs,
    ):
        super().__init__(img_shape, channel_names, grid_type, lmax=lmax)
        self.alpha = alpha
        self.beta = beta
        self.channel_reduction = channel_reduction
        self.eps = eps
        ls = np.arange(self.sht.lmax, dtype=np.float64).reshape(-1, 1)
        lw = np.power(offset + relative_weight * ls * (ls + 1.0), fraction)
        # fold in the one-sided m-doubling and the 1/4pi Parseval normalization
        self.lm_weights = (lw * self.mode_weights[0, 0] / (4.0 * np.pi)).astype(np.float32)

    @property
    def n_channels(self):
        return 1 if self.channel_reduction else len(self.channel_names)

    def _snorm_beta(self, c2):
        """Weighted spectral norm^beta from split coefficients (..., C, L, M, 2)."""
        spec2 = jnp.square(c2[..., 0]) + jnp.square(c2[..., 1])
        red = jnp.sum(spec2 * jnp.asarray(self.lm_weights), axis=(-2, -1))
        if self.channel_reduction:
            red = jnp.sum(red, axis=-1, keepdims=True)
        return _safe_frac_pow(red, 0.5 * self.beta, self.eps)

    def __call__(self, forecasts, observations, wgt=None, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        B, E = forecasts.shape[:2]
        fc2 = self.sht.analysis(forecasts.reshape(B * E, *forecasts.shape[2:]).astype(jnp.float32))
        fc2 = fc2.reshape(B, E, *fc2.shape[1:])
        ob2 = self.sht.analysis(observations.astype(jnp.float32))[:, None]

        skill = jnp.mean(self._snorm_beta(fc2 - ob2), axis=1)

        if E > 1:
            iu, ju = np.triu_indices(E, k=1)
            pair = self._snorm_beta(fc2[:, iu] - fc2[:, ju])
            spread = _fair_spread_sum(jnp.sum(pair, axis=1), E, self.alpha)
        else:
            spread = jnp.zeros_like(skill)

        return (skill - 0.5 * spread).reshape(B, -1)


class SpectralL2EnergyScoreLoss(SobolevEnergyScoreLoss):
    """Parseval L2 energy score: the Sobolev score at fraction=0
    (ref energy_score.py:463-655)."""

    def __init__(self, *args, **kwargs):
        kwargs.update(fraction=0.0, offset=1.0)
        super().__init__(*args, **kwargs)
