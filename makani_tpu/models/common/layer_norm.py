"""Normalization layers (flax.linen).

Equivalents of the reference's norm stack (``makani/models/common/
layer_norm.py:30-153`` and ``makani/mpu/layer_norm.py:108-290``). Under pjit
the spatial reductions (means over sharded lat/lon) are plain ``jnp.mean``
/ quadrature sums — GSPMD inserts the cross-device reductions the reference
implements by hand with Welford all-reduces, so a single implementation
serves both serial and spatially-sharded execution.

The geometric variant weights statistics with the spherical quadrature, which
also makes it exact on padded-latitude grids (padded rows carry zero weight).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from jax.ad_checkpoint import checkpoint_name

from makani_tpu.ops.norm import weighted_instance_norm_affine
from makani_tpu.utils.grids import GridQuadrature


def _tag_stats(mean, var):
    # Name the per-(sample, channel) statistics so selective remat policies
    # (sfnonet remat_policy="save_transforms_stats") can pin them: the stats
    # are O(B*C) scalars but recomputing them in backward costs two full
    # spatial-reduction reads of the activation per norm — the dominant
    # elementwise recompute at full resolution. No-op without such a policy.
    return checkpoint_name(mean, "norm_stats"), checkpoint_name(var, "norm_stats")


def _use_fused_norm() -> bool:
    # Opt-in: the hand-VJP norm (ops/norm.py) reads fewer logical bytes on
    # paper but measured 4.7% SLOWER end-to-end on the v5e bench — the
    # custom_vjp is a fusion barrier, and XLA was already folding the norm
    # backward into neighboring fusions (PERF.md round 3). Kept for ablations
    # and for backends where that fusion doesn't happen.
    return os.environ.get("MAKANI_FUSED_NORM", "0") == "1"


def _use_onepass_var() -> bool:
    # One-pass statistics: var = E[x^2] - E[x]^2 lets XLA fuse both reduces
    # into a single read of x (the two-pass form's var depends on mean, so
    # the stats cost two reads). Activations entering these norms are
    # post-GEMM, near zero-mean, and the result only feeds rsqrt(var + eps),
    # so the cancellation error of the textbook-unstable form is harmless
    # here. Measured SLOWER end-to-end on the v5e bench (12.74 vs 13.20
    # samples/s): the backward of E[x^2] restructures the bwd fusions XLA
    # was already sharing (same failure mode as the hand-VJP norm, PERF.md).
    # Kept opt-in for ablations; default off.
    return os.environ.get("MAKANI_ONEPASS_VAR", "0") == "1"

__all__ = ["InstanceNorm2d", "GeometricInstanceNormS2", "ChannelLayerNorm"]


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel normalization over the spatial dims (NCHW).

    Matches ``nn.InstanceNorm2d(affine, track_running_stats=False)``. If
    ``nlat_phys`` is set, statistics ignore padded latitude rows beyond it
    (the TPU uneven-split convention).
    """

    num_features: int
    eps: float = 1e-6
    affine: bool = True
    nlat_phys: int | None = None
    channels_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (self.num_features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.num_features,), jnp.float32)
        # spatial axes: NCHW -> (-2, -1); NHWC -> (-3, -2)
        sp = (-3, -2) if self.channels_last else (-2, -1)
        lat_ax, lon_ax = sp
        if _use_fused_norm():
            H, W = x.shape[lat_ax], x.shape[lon_ax]
            if self.nlat_phys is not None and self.nlat_phys < H:
                q = (np.arange(H) < self.nlat_phys).astype(np.float32)[:, None] / (self.nlat_phys * W)
            else:
                q = np.full((1, 1), 1.0 / (H * W), np.float32)
            w = weight if self.affine else jnp.ones((self.num_features,), jnp.float32)
            b = bias if self.affine else jnp.zeros((self.num_features,), jnp.float32)
            return weighted_instance_norm_affine(x, w, b, jnp.asarray(q), self.channels_last, self.eps)
        xs = x.astype(jnp.float32)
        if self.nlat_phys is not None and self.nlat_phys < x.shape[lat_ax]:
            nlat_pad = x.shape[lat_ax]
            mask = (jnp.arange(nlat_pad) < self.nlat_phys).astype(jnp.float32)
            mask = mask[:, None, None] if self.channels_last else mask[:, None]
            count = self.nlat_phys * x.shape[lon_ax]
            if _use_onepass_var():
                xm = xs * mask
                mean = jnp.sum(xm, axis=sp, keepdims=True) / count
                m2 = jnp.sum(xm * xs, axis=sp, keepdims=True) / count
                var = jnp.maximum(m2 - jnp.square(mean), 0.0)
            else:
                mean = jnp.sum(xs * mask, axis=sp, keepdims=True) / count
                var = jnp.sum(jnp.square(xs - mean) * mask, axis=sp, keepdims=True) / count
        elif _use_onepass_var():
            mean = jnp.mean(xs, axis=sp, keepdims=True)
            m2 = jnp.mean(jnp.square(xs), axis=sp, keepdims=True)
            var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        else:
            mean = jnp.mean(xs, axis=sp, keepdims=True)
            var = jnp.var(xs, axis=sp, keepdims=True)
        mean, var = _tag_stats(mean, var)
        y = ((xs - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)
        if self.affine:
            if self.channels_last:
                y = y * weight.astype(x.dtype) + bias.astype(x.dtype)
            else:
                y = y * weight.astype(x.dtype)[None, :, None, None] + bias.astype(x.dtype)[None, :, None, None]
        return y


class GeometricInstanceNormS2(nn.Module):
    """Instance norm with quadrature-weighted (area-correct) statistics
    (ref common/layer_norm.py:30-153)."""

    img_shape: tuple
    grid_type: str = "equiangular"
    num_features: int = 1
    crop_shape: tuple | None = None
    crop_offset: tuple = (0, 0)
    eps: float = 1e-6
    affine: bool = True
    channels_last: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        from makani_tpu.utils.grids import grid_to_quadrature_rule

        quad_rule = grid_to_quadrature_rule(self.grid_type)
        self._quad = GridQuadrature(
            quad_rule,
            self.img_shape,
            crop_shape=self.crop_shape,
            crop_offset=self.crop_offset,
            normalize=True,
        )
        if self.affine:
            self.weight = self.param("weight", nn.initializers.ones, (self.num_features,), jnp.float32)
            self.bias = self.param("bias", nn.initializers.zeros, (self.num_features,), jnp.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if _use_fused_norm():
            lat_ax, lon_ax = (-3, -2) if self.channels_last else (-2, -1)
            q = self._quad.quad_weight  # normalized (sums to 1); numpy
            # padded-latitude convention: zero weight beyond the physical grid
            if x.shape[lat_ax] > q.shape[0] or x.shape[lon_ax] > q.shape[1]:
                q = np.pad(q, [(0, x.shape[lat_ax] - q.shape[0]), (0, x.shape[lon_ax] - q.shape[1])])
            if self.affine:
                weight, bias = self.weight, self.bias
            else:
                weight = jnp.ones((self.num_features,), jnp.float32)
                bias = jnp.zeros((self.num_features,), jnp.float32)
            return weighted_instance_norm_affine(x, weight, bias, jnp.asarray(q), self.channels_last, self.eps)
        xs = x.astype(jnp.float32)
        if self.channels_last:
            mean = self._quad(xs, channels_last=True)[..., None, None, :]
            if _use_onepass_var():
                m2 = self._quad(jnp.square(xs), channels_last=True)[..., None, None, :]
                var = jnp.maximum(m2 - jnp.square(mean), 0.0)
            else:
                var = self._quad(jnp.square(xs - mean), channels_last=True)[..., None, None, :]
        else:
            mean = self._quad(xs)[..., None, None]
            if _use_onepass_var():
                m2 = self._quad(jnp.square(xs))[..., None, None]
                var = jnp.maximum(m2 - jnp.square(mean), 0.0)
            else:
                var = self._quad(jnp.square(xs - mean))[..., None, None]
        mean, var = _tag_stats(mean, var)
        y = ((xs - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)
        if self.affine:
            if self.channels_last:
                y = y * self.weight.astype(x.dtype) + self.bias.astype(x.dtype)
            else:
                y = y * self.weight.astype(x.dtype)[None, :, None, None] + self.bias.astype(x.dtype)[None, :, None, None]
        return y


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel dim of NCHW input (ref DistributedLayerNorm,
    mpu/layer_norm.py:256-290; channel dim is never sharded spatially so the
    serial form is exact)."""

    num_features: int
    eps: float = 1e-6
    affine: bool = True
    channels_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xs = x.astype(jnp.float32)
        ax = -1 if self.channels_last else 1
        mean = jnp.mean(xs, axis=ax, keepdims=True)
        var = jnp.var(xs, axis=ax, keepdims=True)
        y = ((xs - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (self.num_features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.num_features,), jnp.float32)
            if self.channels_last:
                y = y * weight.astype(x.dtype) + bias.astype(x.dtype)
            else:
                y = y * weight.astype(x.dtype)[None, :, None, None] + bias.astype(x.dtype)[None, :, None, None]
        return y
