"""Adjusted MSE loss in spectral space (ref makani/utils/losses/amse_loss.py:29-114,
arXiv:2501.19374 eq. 6).

Per degree l, with amplitude norms n_x(l), n_y(l) and spectral coherence
coh(l) = Re<x, y>_l / (n_x n_y):

    loss_l = (n_x - n_y)^2 + 2 max(n_x^2, n_y^2) (1 - coh_l)

The amplitude term trains the power spectrum, the coherence term the phases;
the max() weighting keeps the phase term active when either field carries
power. All spectral sums use the one-sided m-doubling and the 1/4pi
normalization so magnitudes match the geometric losses.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .base_loss import LossType, SpectralBaseLoss

__all__ = ["SpectralAMSELoss"]


class SpectralAMSELoss(SpectralBaseLoss):
    type = LossType.Deterministic

    def __init__(self, img_shape, channel_names=(), grid_type="equiangular", eps: float = 1.0e-6, **kwargs):
        super().__init__(img_shape, channel_names, grid_type)
        self.eps = eps

    def __call__(self, prd, tar, wgt=None, **kwargs):
        x2 = self.sht.analysis(prd.astype(jnp.float32))  # (B, C, L, M, 2)
        y2 = self.sht.analysis(tar.astype(jnp.float32))

        xsq = jnp.square(x2[..., 0]) + jnp.square(x2[..., 1])
        ysq = jnp.square(y2[..., 0]) + jnp.square(y2[..., 1])
        # Re(x conj(y)) in split-complex
        xy = x2[..., 0] * y2[..., 0] + x2[..., 1] * y2[..., 1]

        if wgt is not None:
            xsq, ysq, xy = xsq * wgt, ysq * wgt, xy * wgt

        mw = jnp.asarray(self.mode_weights)
        inv_area = 1.0 / (4.0 * np.pi)
        xnorm2 = inv_area * jnp.sum(mw * xsq, axis=-1)  # (B, C, L)
        ynorm2 = inv_area * jnp.sum(mw * ysq, axis=-1)
        xysum = inv_area * jnp.sum(mw * xy, axis=-1)

        xnorm = jnp.sqrt(xnorm2)
        ynorm = jnp.sqrt(ynorm2)
        # eps-guard: degrees where either field has no power
        coh = xysum / jnp.sqrt(xnorm2 * ynorm2 + self.eps)

        loss = jnp.square(xnorm - ynorm) + 2.0 * jnp.maximum(xnorm2, ynorm2) * (1.0 - coh)
        return jnp.sum(loss, axis=-1).reshape(prd.shape[0], -1)
