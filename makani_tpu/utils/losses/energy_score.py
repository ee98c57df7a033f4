"""Energy scores for ensemble forecasts (ref makani/utils/losses/
energy_score.py).

ES(X, y) = E||X - y||_w - 0.5 E||X - X'||_w with quadrature-weighted L2
norms over space (per channel), the pairwise term optionally fair
(1/(E(E-1))) and tempered by ``alpha``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base_loss import GeometricBaseLoss, LossType

__all__ = ["EnergyScoreLoss"]


class EnergyScoreLoss(GeometricBaseLoss):
    type = LossType.Probabilistic

    def __init__(self, img_shape, crop_shape=None, crop_offset=(0, 0), channel_names=(), grid_type="equiangular", alpha: float = 1.0, fair: bool = True, eps: float = 1e-8, **kwargs):
        super().__init__(img_shape, crop_shape, crop_offset, channel_names, grid_type)
        self.alpha = alpha
        self.fair = fair
        self.eps = eps

    def _norm(self, diff):
        """quadrature-weighted L2 norm over space, per (batch..., channel)."""
        return jnp.sqrt(self.quadrature(jnp.square(diff)) + self.eps)

    def __call__(self, forecasts, observations, wgt=None, **kwargs):
        if forecasts.ndim != 5:
            raise ValueError(f"forecasts must be 5D (B, E, C, H, W), got {forecasts.ndim}D")
        B, E = forecasts.shape[:2]

        skill = jnp.mean(self._norm(forecasts - observations[:, None]), axis=1)  # (B, C)

        if E > 1:
            diffs = forecasts[:, :, None] - forecasts[:, None, :]  # (B, E, E, C, H, W)
            pair = self._norm(diffs)  # (B, E, E, C)
            denom = E * (E - 1.0) if self.fair else E * E
            spread = jnp.sum(pair, axis=(1, 2)) / denom * self.alpha
        else:
            spread = 0.0

        return (skill - 0.5 * spread).reshape(B, -1)
