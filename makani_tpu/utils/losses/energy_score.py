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

__all__ = [
    "EnergyScoreLoss",
    "LpEnergyScoreLoss",
    "SobolevEnergyScoreLoss",
    "SpectralL2EnergyScoreLoss",
    "SpectralCoherenceLoss",
    "CorrectedSpectralL2EnergyScoreLoss",
]


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


class SpectralCoherenceLoss(SpectralBaseLoss):
    """Per-degree PSD + phase-coherence decomposition of the spectral energy
    score (ref energy_score.py:655-855):

        loss_l = (PSD_f - PSD_y)^2 [/ PSD_y if relative]
                 + 2 [PSD_y] (coh_skill_l - 0.5 coh_spread_l)

    where coh_skill = mean_e (1 - Coh(f_e, y)) and coh_spread the pairwise
    inter-member decoherence, summed over l. Separating amplitude and phase
    prevents "cheap spread" from inflated decorrelated power.
    """

    type = LossType.Probabilistic

    def __init__(self, img_shape, channel_names=(), grid_type="equiangular", lmax=None, relative: bool = False, channel_reduction: bool = True, eps: float = 1e-6, **kwargs):
        super().__init__(img_shape, channel_names, grid_type, lmax=lmax)
        self.relative = relative
        self.channel_reduction = channel_reduction
        self.eps = eps

    @property
    def n_channels(self):
        return 1 if self.channel_reduction else len(self.channel_names)

    def _sht_norm(self, x):
        c2 = self.sht.analysis(x.astype(jnp.float32)) / np.sqrt(4.0 * np.pi)
        return c2

    def __call__(self, forecasts, observations, wgt=None, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        B, E = forecasts.shape[:2]
        f2 = self._sht_norm(forecasts.reshape(B * E, *forecasts.shape[2:]))
        f2 = f2.reshape(B, E, *f2.shape[1:])  # (B, E, C, L, M, 2)
        y2 = self._sht_norm(observations)[:, None]

        mw = jnp.asarray(self.mode_weights)
        psd_f = jnp.sum(mw * (jnp.square(f2[..., 0]) + jnp.square(f2[..., 1])), axis=-1)  # (B, E, C, L)
        psd_y = jnp.sum(mw * (jnp.square(y2[..., 0]) + jnp.square(y2[..., 1])), axis=-1)  # (B, 1, C, L)
        cross_y = jnp.sum(mw * (f2[..., 0] * y2[..., 0] + f2[..., 1] * y2[..., 1]), axis=-1)
        coh_y = cross_y / jnp.sqrt(psd_f * psd_y + self.eps)

        psd_skill = jnp.square(psd_f - psd_y)
        if self.relative:
            psd_skill = psd_skill / (psd_y + self.eps)
        psd_skill = jnp.mean(psd_skill, axis=1)  # (B, C, L)
        coh_skill = jnp.mean(1.0 - coh_y, axis=1)

        if E > 1:
            cross_ee = jnp.sum(
                mw[None] * (f2[:, :, None, ..., 0] * f2[:, None, :, ..., 0] + f2[:, :, None, ..., 1] * f2[:, None, :, ..., 1]),
                axis=-1,
            )
            coh_ee = cross_ee / jnp.sqrt(psd_f[:, :, None] * psd_f[:, None, :] + self.eps)
            eye = jnp.eye(E, dtype=bool)[None, :, :, None, None]
            coh_spread = jnp.sum(jnp.where(eye, 0.0, 1.0 - coh_ee), axis=(1, 2)) / float(E * (E - 1))
        else:
            coh_spread = jnp.zeros_like(coh_skill)

        phase = coh_skill - 0.5 * coh_spread
        loss = psd_skill + 2.0 * (phase if self.relative else psd_y[:, 0] * phase)
        loss = jnp.sum(loss, axis=-1)  # over l
        if self.channel_reduction:
            loss = jnp.sum(loss, axis=-1, keepdims=True)
        return loss.reshape(B, -1)


class CorrectedSpectralL2EnergyScoreLoss(SpectralBaseLoss):
    """Spectral L2 energy score with the spread term rescaled by the truth
    PSD (ref energy_score.py:859-1022 "Option 2"): the standard spread reward
    P_k (1 - coherence) is replaced by P_k* (1 - coherence), bounding it by
    the true signal level so inflating power + decorrelating phases no longer
    lowers the score."""

    type = LossType.Probabilistic

    def __init__(self, img_shape, channel_names=(), grid_type="equiangular", lmax=None, alpha: float = 1.0, beta: float = 1.0, channel_reduction: bool = True, eps: float = 1e-6, **kwargs):
        super().__init__(img_shape, channel_names, grid_type, lmax=lmax)
        self.alpha = alpha
        self.beta = beta
        self.channel_reduction = channel_reduction
        self.eps = eps
        self.lm_weights = (self.mode_weights[0, 0] / (4.0 * np.pi)).astype(np.float32)

    @property
    def n_channels(self):
        return 1 if self.channel_reduction else len(self.channel_names)

    def _wsum(self, c2):
        """|coeff|^2, mode-weighted, summed over m: (..., C, L)."""
        spec2 = jnp.square(c2[..., 0]) + jnp.square(c2[..., 1])
        return jnp.sum(spec2 * jnp.asarray(self.lm_weights), axis=-1)

    def __call__(self, forecasts, observations, wgt=None, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        B, E = forecasts.shape[:2]
        f2 = self.sht.analysis(forecasts.reshape(B * E, *forecasts.shape[2:]).astype(jnp.float32))
        f2 = f2.reshape(B, E, *f2.shape[1:])
        y2 = self.sht.analysis(observations.astype(jnp.float32))[:, None]

        psd_pred = jnp.mean(self._wsum(f2), axis=1)  # (B, C, L)
        psd_true = self._wsum(y2)[:, 0]

        def norm_beta(d2):
            red = jnp.sum(self._wsum(d2), axis=-1)  # over l -> (..., C)
            if self.channel_reduction:
                red = jnp.sum(red, axis=-1, keepdims=True)
            return _safe_frac_pow(red, 0.5 * self.beta, self.eps)

        skill = jnp.mean(norm_beta(f2 - y2), axis=1)
        if E > 1:
            iu, ju = np.triu_indices(E, k=1)
            pair = norm_beta(f2[:, iu] - f2[:, ju])
            spread = _fair_spread_sum(jnp.sum(pair, axis=1), E, self.alpha)
        else:
            spread = jnp.zeros_like(skill)

        # PSD-cap correction: rescale the spread term by truth/pred power
        scale = jnp.sum(psd_true, axis=-1) / (jnp.sum(psd_pred, axis=-1) + self.eps)
        scale = jnp.minimum(scale, 1.0)
        if self.channel_reduction:
            scale = jnp.mean(scale, axis=-1, keepdims=True)
        return (skill - 0.5 * spread * scale).reshape(B, -1)
