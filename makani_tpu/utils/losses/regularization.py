"""Regularization terms for (ensemble) training (ref
makani/utils/losses/regularization.py:31-416).

``DriftRegularization`` — penalizes the difference between the global means
of forecast and observation, |<prd> - <tar>|^p, controlling slow drift of
conserved quantities.

``SpectralRegularization`` — penalizes the per-degree power spectral density
mismatch, mean_l |PSD_f(l) - PSD_y(l)| (optionally of log-PSDs), which keeps
ensemble members from washing out small-scale power.

``CoherenceRegularization`` — penalizes low signed spectral coherence between
each member and the observation in a wavenumber band [lmin, lmax) — the
mesoscale range where decorrelated noise appears first:

    Coh_l = sum_m w_m Re(f conj(y)) / sqrt(PSD_f PSD_y + eps),
    loss  = mean_{l in band} (1 - mean_e Coh_l^(e))

plus an optional inter-member decoherence term (weight
``ensemble_coherence_weight``) discouraging fully independent phases.

All three are registered as probabilistic: they accept (B, E, C, H, W)
forecasts and average over members; 4D inputs are handled as E=1.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .base_loss import GeometricBaseLoss, LossType, SpectralBaseLoss

__all__ = ["DriftRegularization", "SpectralRegularization", "CoherenceRegularization"]


def _ensure_ensemble(prd, tar):
    """Normalize to prd (B, E, C, H, W), tar (B, 1, C, H, W)."""
    if prd.ndim == 4:
        prd = prd[:, None]
    return prd, tar[:, None]


class DriftRegularization(GeometricBaseLoss):
    type = LossType.Probabilistic

    def __init__(self, img_shape, crop_shape=None, crop_offset=(0, 0), channel_names=(), grid_type="equiangular", p: float = 1.0, **kwargs):
        super().__init__(img_shape, crop_shape, crop_offset, channel_names, grid_type)
        self.p = p

    def __call__(self, prd, tar, wgt=None, **kwargs):
        prd, tar = _ensure_ensemble(prd, tar)
        loss = jnp.power(jnp.abs(self.quadrature(prd) - self.quadrature(tar)), self.p)
        return jnp.mean(loss, axis=1).reshape(prd.shape[0], -1)


class SpectralRegularization(SpectralBaseLoss):
    type = LossType.Probabilistic

    def __init__(self, img_shape, channel_names=(), grid_type="equiangular", lmax=None, eps: float = 1.0e-10, logarithmic: bool = False, **kwargs):
        super().__init__(img_shape, channel_names, grid_type, lmax=lmax)
        self.eps = eps
        self.logarithmic = logarithmic

    def _psd(self, x):
        """Per-degree power: (..., C, L); 1/4pi-normalized Parseval sum over m."""
        spec2 = self.spectrum_sq(x) / (4.0 * np.pi)
        return jnp.sum(spec2, axis=-1)

    def __call__(self, prd, tar, wgt=None, **kwargs):
        prd, tar = _ensure_ensemble(prd, tar)
        B, E = prd.shape[:2]
        psd_f = self._psd(prd.reshape(B * E, *prd.shape[2:])).reshape(B, E, -1, self.sht.lmax)
        psd_y = self._psd(tar[:, 0])[:, None]
        if self.logarithmic:
            psd_f = jnp.log(psd_f + self.eps)
            psd_y = jnp.log(psd_y + self.eps)
        diff = jnp.mean(jnp.abs(psd_f - psd_y), axis=1)  # over ensemble
        return (jnp.sum(diff, axis=-1) / float(self.sht.lmax)).reshape(B, -1)


class CoherenceRegularization(SpectralBaseLoss):
    type = LossType.Probabilistic

    def __init__(
        self,
        img_shape,
        channel_names=(),
        grid_type="equiangular",
        lmin=None,
        lmax=None,
        ensemble_coherence_weight: float = 0.0,
        eps: float = 1.0e-6,
        **kwargs,
    ):
        super().__init__(img_shape, channel_names, grid_type, lmax=lmax)
        self.eps = eps
        self.ensemble_coherence_weight = ensemble_coherence_weight
        self.lmin = lmin if lmin is not None else 0
        if self.lmin >= self.sht.lmax:
            raise ValueError(f"lmin ({self.lmin}) must be below the SHT truncation lmax ({self.sht.lmax})")
        band = np.zeros(self.sht.lmax, dtype=np.float32)
        band[self.lmin :] = 1.0
        self.l_band = band
        self.band_size = max(band.sum(), 1.0)

    def __call__(self, prd, tar, wgt=None, **kwargs):
        prd, tar = _ensure_ensemble(prd, tar)
        B, E = prd.shape[:2]
        f2 = self.sht.analysis(prd.reshape(B * E, *prd.shape[2:]).astype(jnp.float32))
        f2 = f2.reshape(B, E, *f2.shape[1:])  # (B, E, C, L, M, 2)
        y2 = self.sht.analysis(tar[:, 0].astype(jnp.float32))[:, None]  # (B, 1, C, L, M, 2)

        mw = jnp.asarray(self.mode_weights)  # (1, 1, 1, M) -> broadcasts over (B, E, C, L, M)
        psd_f = jnp.sum(mw * (jnp.square(f2[..., 0]) + jnp.square(f2[..., 1])), axis=-1)
        psd_y = jnp.sum(mw * (jnp.square(y2[..., 0]) + jnp.square(y2[..., 1])), axis=-1)
        cross = jnp.sum(mw * (f2[..., 0] * y2[..., 0] + f2[..., 1] * y2[..., 1]), axis=-1)

        # signed coherence in [-1, 1] against the observation
        coh = cross / jnp.sqrt(psd_f * psd_y + self.eps)
        loss = jnp.mean(1.0 - coh, axis=1)  # (B, C, L)

        if self.ensemble_coherence_weight != 0.0 and E > 1:
            # pairwise member coherence, diagonal excluded
            cross_ee = jnp.sum(
                mw[None] * (f2[:, :, None, ..., 0] * f2[:, None, :, ..., 0] + f2[:, :, None, ..., 1] * f2[:, None, :, ..., 1]),
                axis=-1,
            )  # (B, E, E, C, L)
            coh_ee = cross_ee / jnp.sqrt(psd_f[:, :, None] * psd_f[:, None, :] + self.eps)
            eye = jnp.eye(E, dtype=bool)[None, :, :, None, None]
            dec = jnp.where(eye, 0.0, 1.0 - coh_ee)
            inter = jnp.sum(dec, axis=(1, 2)) / float(E * (E - 1))
            loss = loss + self.ensemble_coherence_weight * inter

        loss = jnp.sum(jnp.asarray(self.l_band) * loss, axis=-1) / self.band_size
        return loss.reshape(B, -1)
