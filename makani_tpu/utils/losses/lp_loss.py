"""Lp losses on the sphere, geometric and spectral
(ref makani/utils/losses/lp_loss.py:27-260 and SpectralH1).

Each loss maps (prd, tar) of shape (B, C, H, W) -> per-channel values (B, C).
Multistep predictions arrive with channels (n_future+1)*C and reduce the same
way.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .base_loss import GeometricBaseLoss, SpectralBaseLoss

__all__ = ["GeometricLpLoss", "SpectralLpLoss", "SpectralH1Loss"]


class GeometricLpLoss(GeometricBaseLoss):
    """Quadrature-weighted Lp norm of the error; optionally relative and/or
    without the 1/p root ("squared")."""

    def __init__(self, img_shape, crop_shape=None, crop_offset=(0, 0), channel_names=(), grid_type="equiangular", p: float = 2.0, relative: bool = False, squared: bool = False, eps: float = 1e-6, **kwargs):
        super().__init__(img_shape, crop_shape, crop_offset, channel_names, grid_type)
        self.p = p
        self.relative = relative
        self.squared = squared
        self.eps = eps

    def __call__(self, prd, tar, wgt=None, **kwargs):
        diff = jnp.abs(prd - tar) ** self.p
        if wgt is not None:
            diff = diff * wgt
        norms = self.quadrature(diff)
        norms = norms.reshape(prd.shape[0], -1)
        if self.relative:
            tarr = jnp.abs(tar) ** self.p
            if wgt is not None:
                tarr = tarr * wgt
            tnorms = self.quadrature(tarr).reshape(prd.shape[0], -1)
            norms = norms / (tnorms + self.eps)
        if not self.squared:
            norms = norms ** (1.0 / self.p)
        return norms


def _mode_weight(wgt):
    """Per-(l, m) spectral weight, applied to the squared spectrum (ref
    lp_loss.py:148-150 ``coeffsp = coeffsp * wgt``). Accepts (L, M) or the
    split-complex-aligned (L, M, 1)."""
    w = jnp.asarray(wgt)
    if w.ndim >= 3 and w.shape[-1] == 1:
        w = w[..., 0]
    return w


class SpectralLpLoss(SpectralBaseLoss):
    """Lp norm over SH coefficients (ref lp_loss.py:110-244)."""

    def __init__(self, img_shape, channel_names=(), grid_type="equiangular", p: float = 2.0, relative: bool = False, squared: bool = False, eps: float = 1e-6, **kwargs):
        super().__init__(img_shape, channel_names, grid_type)
        self.p = p
        self.relative = relative
        self.squared = squared
        self.eps = eps

    def __call__(self, prd, tar, wgt=None, **kwargs):
        diff2 = self.spectrum_sq(prd - tar)
        if wgt is not None:
            diff2 = diff2 * _mode_weight(wgt)
        norms = jnp.sum(diff2, axis=(-2, -1)) ** (self.p / 2.0)
        norms = norms.reshape(prd.shape[0], -1)
        if self.relative:
            t2 = self.spectrum_sq(tar)
            if wgt is not None:
                t2 = t2 * _mode_weight(wgt)
            tnorms = jnp.sum(t2, axis=(-2, -1)) ** (self.p / 2.0)
            norms = norms / (tnorms.reshape(prd.shape[0], -1) + self.eps)
        if not self.squared:
            norms = norms ** (1.0 / self.p)
        return norms


class SpectralH1Loss(SpectralBaseLoss):
    """Sobolev H1 norm in spectral space: modes weighted by l(l+1)
    (ref makani/utils/losses/h1_loss.py semantics)."""

    def __init__(self, img_shape, channel_names=(), grid_type="equiangular", relative: bool = False, squared: bool = False, eps: float = 1e-6, alpha: float = 0.5, **kwargs):
        super().__init__(img_shape, channel_names, grid_type)
        self.relative = relative
        self.squared = squared
        self.eps = eps
        self.alpha = alpha
        ls = np.arange(self.sht.lmax, dtype=np.float32)
        self.l_weights = (ls * (ls + 1.0)).reshape(1, 1, -1, 1)

    def _h1_sq(self, spec2):
        l2 = jnp.sum(spec2, axis=(-2, -1))
        h1 = jnp.sum(spec2 * jnp.asarray(self.l_weights), axis=(-2, -1))
        return self.alpha * l2 + (1.0 - self.alpha) * h1

    def __call__(self, prd, tar, wgt=None, **kwargs):
        diff2 = self.spectrum_sq(prd - tar)
        if wgt is not None:
            diff2 = diff2 * _mode_weight(wgt)
        val = self._h1_sq(diff2)
        val = val.reshape(prd.shape[0], -1)
        if self.relative:
            t2 = self.spectrum_sq(tar)
            if wgt is not None:
                t2 = t2 * _mode_weight(wgt)
            tval = self._h1_sq(t2).reshape(prd.shape[0], -1)
            val = val / (tval + self.eps)
        if not self.squared:
            val = jnp.sqrt(val)
        return val
