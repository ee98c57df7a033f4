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

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.utils.grids import GridQuadrature

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
        xs = x.astype(jnp.float32)
        # spatial axes: NCHW -> (-2, -1); NHWC -> (-3, -2)
        sp = (-3, -2) if self.channels_last else (-2, -1)
        lat_ax, lon_ax = sp
        if self.nlat_phys is not None and self.nlat_phys < x.shape[lat_ax]:
            nlat_pad = x.shape[lat_ax]
            mask = (jnp.arange(nlat_pad) < self.nlat_phys).astype(jnp.float32)
            mask = mask[:, None, None] if self.channels_last else mask[:, None]
            count = self.nlat_phys * x.shape[lon_ax]
            mean = jnp.sum(xs * mask, axis=sp, keepdims=True) / count
            var = jnp.sum(jnp.square(xs - mean) * mask, axis=sp, keepdims=True) / count
        else:
            mean = jnp.mean(xs, axis=sp, keepdims=True)
            var = jnp.var(xs, axis=sp, keepdims=True)
        y = ((xs - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (self.num_features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.num_features,), jnp.float32)
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
        xs = x.astype(jnp.float32)
        if self.channels_last:
            mean = self._quad(xs, channels_last=True)[..., None, None, :]
            var = self._quad(jnp.square(xs - mean), channels_last=True)[..., None, None, :]
        else:
            mean = self._quad(xs)[..., None, None]
            var = self._quad(jnp.square(xs - mean))[..., None, None]
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
