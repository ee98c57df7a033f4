"""Spectral convolution and spectral attention layers (flax.linen).

TPU-native equivalents of the reference's spectral layers
(``makani/models/common/spectral_convolution.py:37-519``): convolution on S^2
as multiplication in spherical-harmonic space,

    y = ISHT( W . SHT(x) )

with either one weight per degree l ("dhconv", rotation-equivariant) or per
(l, m) pair ("diagonal"), plus the nonlinear variant that runs a complex MLP
over the coefficients.

Transforms always run in fp32 (the SHT is a long quadrature accumulation;
mirrors the reference's autocast-disabled islands at
spectral_convolution.py:237-256); the contraction runs in the surrounding
compute dtype. The transform handles are ordinary callables — serial
(`makani_tpu.ops.sht`) or distributed (`makani_tpu.parallel.transforms`) —
so the layer is oblivious to spatial sharding.

Complex weights are stored as a trailing real/imag pair so optimizer,
checkpoint, and sharding layers only ever see real arrays, and the
contraction lowers to real MXU matmuls.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.common.activations import complex_relu_s
from makani_tpu.models.common.contractions import (
    compl_exp_mul2d_s,
    compl_exp_muladd2d_s,
    compl_mul2d_s,
    compl_muladd2d_s,
    contract_dense_s,
)

__all__ = ["SpectralConv", "SpectralAttention"]


def _complex_normal_init(scale_per_l, shape, l_axis: int):
    """Init for a split-complex weight of shape ``shape + (2,)``.

    ``scale_per_l`` is a per-degree std vector broadcast along ``l_axis``;
    the l=0 entry is boosted by sqrt(2) (m=0 coefficients are real-only, so
    half the variance would otherwise be lost) — ref spectral_convolution.py:
    188-192.
    """

    def init(key):
        w = jax.random.normal(key, tuple(shape) + (2,), jnp.float32) / math.sqrt(2.0)
        bshape = [1] * (len(shape) + 1)
        bshape[l_axis] = shape[l_axis]
        return w * scale_per_l.reshape(bshape)

    return init


class SpectralConv(nn.Module):
    """Linear spectral convolution; returns ``(y, residual)`` like the
    reference so callers can form skips at the output resolution."""

    forward_transform: Any
    inverse_transform: Any
    in_channels: int
    out_channels: int
    num_groups: int = 1
    operator_type: str = "dhconv"
    separable: bool = False
    use_bias: bool = False
    gain: float = 1.0
    channels_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        g = self.num_groups
        if self.in_channels % g or self.out_channels % g:
            raise ValueError("channels must be divisible by num_groups")
        if self.separable and self.in_channels != self.out_channels:
            raise ValueError("separable requires in_channels == out_channels")

        # the transforms may be padded (distributed); weights span the padded modes
        modes_lat = getattr(self.inverse_transform, "lmax_pad", self.inverse_transform.lmax)
        modes_lon = getattr(self.inverse_transform, "mmax_pad", self.inverse_transform.mmax)

        scale_residual = (
            self.forward_transform.nlat != self.inverse_transform.nlat
            or self.forward_transform.nlon != self.inverse_transform.nlon
            or getattr(self.forward_transform, "grid", None) != getattr(self.inverse_transform, "grid", None)
        )

        wshape = [g, self.in_channels // g]
        if not self.separable:
            wshape += [self.out_channels // g]
        if self.operator_type == "diagonal":
            wshape += [modes_lat, modes_lon]
            l_axis = len(wshape) - 2
        elif self.operator_type == "dhconv":
            wshape += [modes_lat]
            l_axis = len(wshape) - 1
        else:
            raise ValueError(f"Unsupported operator type {self.operator_type}")

        scale = math.sqrt(self.gain / (self.in_channels // g)) * jnp.ones((modes_lat,), jnp.float32)
        scale = scale.at[0].mul(math.sqrt(2.0))
        weight = self.param("weight", _complex_normal_init(scale, wshape, l_axis), )

        dtype = x.dtype
        residual = x

        # --- forward transform split-complex throughout (no complex dtype on
        # device; the axon TPU backend has none). Transform IO dtype follows
        # the precision policy: bf16 in DEFAULT mode (the MXU rounds operands
        # to bf16 regardless; fp32 IO would only double full-res HBM traffic),
        # fp32 for the multi-pass HIGH/HIGHEST modes.
        from jax.ad_checkpoint import checkpoint_name

        from makani_tpu.ops.precision import transform_io_dtype

        # transform outputs are tagged so the "save_transforms" remat policy
        # (sfnonet.remat_policy) can keep them while recomputing the cheap
        # elementwise/MLP chains — at full res the SHT matmuls dominate the
        # recompute bill of plain per-block remat
        if self.channels_last:
            # x: (B, H, W, C); spectral layout (B, L, M, C, 2)
            xc2 = checkpoint_name(self.forward_transform.analysis_cl(x.astype(transform_io_dtype())), "spectral_transform")
            if scale_residual:
                residual = self.inverse_transform.synthesis_cl(xc2).astype(dtype)
            B = xc2.shape[0]
            H, W = xc2.shape[-4], xc2.shape[-3]
            xg2 = xc2.reshape(B, H, W, g, self.in_channels // g, 2)
            yg2 = contract_dense_s(
                xg2, weight, separable=self.separable, operator_type=self.operator_type, channels_last=True
            )
            y2 = yg2.reshape(B, H, W, self.out_channels, 2)
            y = checkpoint_name(self.inverse_transform.synthesis_cl(y2), "spectral_transform").astype(dtype)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (1, self.out_channels, 1, 1), jnp.float32)
                y = y + bias.reshape(1, 1, 1, self.out_channels).astype(dtype)
            return y, residual

        xc2 = checkpoint_name(self.forward_transform.analysis(x.astype(transform_io_dtype())), "spectral_transform")
        if scale_residual:
            residual = self.inverse_transform.synthesis(xc2).astype(dtype)

        # --- contraction on the split representation
        B = xc2.shape[0]
        H, W = xc2.shape[-3], xc2.shape[-2]
        xg2 = xc2.reshape(B, g, self.in_channels // g, H, W, 2)
        yg2 = contract_dense_s(xg2, weight, separable=self.separable, operator_type=self.operator_type)
        y2 = yg2.reshape(B, self.out_channels, H, W, 2)

        # --- inverse transform in fp32
        y = checkpoint_name(self.inverse_transform.synthesis(y2), "spectral_transform").astype(dtype)

        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (1, self.out_channels, 1, 1), jnp.float32)
            y = y + bias.astype(dtype)

        return y, residual


class SpectralAttention(nn.Module):
    """Nonlinear spectral layer: complex MLP over SH coefficients
    (ref spectral_convolution.py:267-519)."""

    forward_transform: Any
    inverse_transform: Any
    in_channels: int
    out_channels: int
    operator_type: str = "diagonal"
    hidden_size_factor: int = 2
    complex_activation: str = "real"
    use_bias: bool = False
    spectral_layers: int = 1
    gain: float = 1.0
    channels_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        modes_lat = getattr(self.forward_transform, "lmax_pad", self.forward_transform.lmax)
        hidden = int(self.hidden_size_factor * self.in_channels)

        scale_residual = (
            self.forward_transform.nlat != self.inverse_transform.nlat
            or self.forward_transform.nlon != self.inverse_transform.nlon
            or getattr(self.forward_transform, "grid", None) != getattr(self.inverse_transform, "grid", None)
        )

        if self.operator_type == "diagonal":
            mul, muladd = compl_mul2d_s, compl_muladd2d_s
            wshapes = [(self.in_channels, hidden)] + [(hidden, hidden)] * (self.spectral_layers - 1)
            wout_shape = (hidden, self.out_channels)
        elif self.operator_type == "l-dependant":
            mul, muladd = compl_exp_mul2d_s, compl_exp_muladd2d_s
            wshapes = [(modes_lat, self.in_channels, hidden)] + [(modes_lat, hidden, hidden)] * (self.spectral_layers - 1)
            wout_shape = (modes_lat, hidden, self.out_channels)
        else:
            raise ValueError("Unknown operator type")

        def cplx_init(std):
            def init(key, shape):
                return jax.random.normal(key, tuple(shape) + (2,), jnp.float32) * (std / math.sqrt(2.0))

            return init

        ws = []
        for i, shp in enumerate(wshapes):
            fan = self.in_channels if i == 0 else hidden
            ws.append(self.param(f"w{i}", cplx_init(math.sqrt(2.0 / fan)), shp))
        out_std = math.sqrt(self.gain / self.in_channels)
        wout = self.param("wout", cplx_init(out_std), wout_shape)
        if self.use_bias:
            bs = [self.param(f"b{i}", cplx_init(out_std), (hidden, 1, 1)) for i in range(self.spectral_layers)]

        dtype = x.dtype
        residual = x
        cl = self.channels_last
        if cl:
            xc2 = self.forward_transform.analysis_cl(x.astype(jnp.float32))
            if scale_residual:
                residual = self.inverse_transform.synthesis_cl(xc2).astype(dtype)
        else:
            xc2 = self.forward_transform.analysis(x.astype(jnp.float32))
            if scale_residual:
                residual = self.inverse_transform.synthesis(xc2).astype(dtype)

        z2 = xc2
        for i in range(self.spectral_layers):
            if self.use_bias:
                # bias stored (hidden, 1, 1, 2); channels-last broadcasts over
                # the leading (B, L, M) dims with channels at -2
                b2 = bs[i].reshape(-1, 2) if cl else bs[i]
                z2 = muladd(z2, ws[i], b2, channels_last=cl)
            else:
                z2 = mul(z2, ws[i], channels_last=cl)
            z2 = complex_relu_s(z2, mode=self.complex_activation)
        z2 = mul(z2, wout, channels_last=cl)

        y = self.inverse_transform.synthesis_cl(z2).astype(dtype) if cl else self.inverse_transform.synthesis(z2).astype(dtype)
        return y, residual
