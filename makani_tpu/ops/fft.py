"""Planar real FFT transforms with mode truncation.

JAX equivalents of the reference's FFT wrappers
(``makani/models/common/fft.py:25-456``): they present the same interface as
the spherical transforms (``nlat``/``nlon``/``lmax``/``mmax`` attributes plus
``__call__``) so spectral layers can swap a planar transform for a spherical
one without changing call sites.

Truncation semantics match the reference: the longitude axis is one-sided
(rfft) and head-sliced to ``mmax``; the latitude axis is two-sided, keeping the
leading ``ceil(lmax/2)`` positive and trailing ``floor(lmax/2)`` negative
frequencies. The inverse zero-pads *between* those blocks.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from . import fft_compat

__all__ = ["RealFFT1", "InverseRealFFT1", "RealFFT2", "InverseRealFFT2", "RealFFT3", "InverseRealFFT3"]


class RealFFT1:
    def __init__(self, nlon: int, lmax: int | None = None, mmax: int | None = None):
        self.nlon = nlon
        self.lmax = min(lmax or nlon // 2 + 1, nlon // 2 + 1)
        self.mmax = min(mmax or nlon // 2 + 1, self.lmax)

    def __call__(self, x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
        y = fft_compat.rfft(x, n=self.nlon, axis=-1, norm=norm)
        return y[..., : self.mmax]


class InverseRealFFT1:
    def __init__(self, nlon: int, lmax: int | None = None, mmax: int | None = None):
        self.nlon = nlon
        self.lmax = min(lmax or nlon // 2 + 1, nlon // 2 + 1)
        self.mmax = min(mmax or nlon // 2 + 1, self.lmax)

    def __call__(self, x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
        return fft_compat.irfft(x, n=self.nlon, axis=-1, norm=norm)


class RealFFT2:
    """Forward 2D real FFT over the last two axes with two-sided lat truncation.

    ``analysis``/``synthesis`` are the split-complex forms (trailing [re, im]
    axis) used on devices without complex support; ``__call__`` keeps the
    complex API for tests and host-side code.
    """

    def __init__(self, nlat: int, nlon: int, lmax: int | None = None, mmax: int | None = None):
        self.nlat = nlat
        self.nlon = nlon
        self.lmax = min(lmax or nlat, nlat)
        self.mmax = min(mmax or nlon // 2 + 1, nlon // 2 + 1)

        self.truncate = not ((self.lmax == self.nlat) and (self.mmax == self.nlon // 2 + 1))
        self.lmax_high = math.ceil(self.lmax / 2)
        self.lmax_low = math.floor(self.lmax / 2)

    def analysis(self, x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
        # m-truncation happens inside the lon DFT GEMM (see fft_compat.rfft_s)
        y = fft_compat.rfft_s(x, n=self.nlon, axis=-1, norm=norm, mout=self.mmax if self.truncate else None)
        y = fft_compat.fft_s(y, n=self.nlat, axis=-2, norm=norm)
        if self.truncate:
            y = jnp.concatenate(
                (y[..., : self.lmax_high, :, :], y[..., y.shape[-3] - self.lmax_low :, :, :]),
                axis=-3,
            )
        return y

    def analysis_cl(self, x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
        """Channels-last analysis: (..., H, W, C) -> split (..., lH, mW, C, 2)."""
        y = fft_compat.rfft_cl_s(x, n=self.nlon, norm=norm, mout=self.mmax if self.truncate else None)
        y = fft_compat.fft_lat_cl_s(y, n=self.nlat, norm=norm)
        if self.truncate:
            y = jnp.concatenate(
                (y[..., : self.lmax_high, :, :, :], y[..., y.shape[-4] - self.lmax_low :, :, :, :]),
                axis=-4,
            )
        return y

    def __call__(self, x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
        return fft_compat.to_complex(self.analysis(x, norm=norm))


class InverseRealFFT2:
    """Inverse 2D real FFT; zero-pads the truncated spectrum back to the grid."""

    def __init__(self, nlat: int, nlon: int, lmax: int | None = None, mmax: int | None = None):
        self.nlat = nlat
        self.nlon = nlon
        self.lmax = min(lmax or nlat, nlat)
        self.mmax = min(mmax or nlon // 2 + 1, nlon // 2 + 1)

        self.truncate = not ((self.lmax == self.nlat) and (self.mmax == self.nlon // 2 + 1))
        self.lmax_high = math.ceil(self.lmax / 2)
        self.lmax_low = math.floor(self.lmax / 2)

    def synthesis(self, x2: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
        xt = x2[..., : self.mmax, :]
        if self.truncate:
            xth = xt[..., : self.lmax_high, :, :]
            xtl = xt[..., xt.shape[-3] - self.lmax_low :, :, :]
            pad = [(0, 0)] * (xt.ndim - 3) + [(0, self.nlat - self.lmax), (0, 0), (0, 0)]
            xt = jnp.concatenate([jnp.pad(xth, pad), xtl], axis=-3)
        return fft_compat.irfft2_s(xt, s=(self.nlat, self.nlon), axes=(-2, -1), norm=norm)

    def synthesis_cl(self, x2: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
        """Channels-last synthesis: split (..., lH, mW, C, 2) -> (..., H, W, C)."""
        xt = x2[..., : self.mmax, :, :]
        if self.truncate:
            xth = xt[..., : self.lmax_high, :, :, :]
            xtl = xt[..., xt.shape[-4] - self.lmax_low :, :, :, :]
            pad = [(0, 0)] * (xt.ndim - 4) + [(0, self.nlat - self.lmax), (0, 0), (0, 0), (0, 0)]
            xt = jnp.concatenate([jnp.pad(xth, pad), xtl], axis=-4)
        xt = fft_compat.ifft_lat_cl_s(xt, n=self.nlat, norm=norm)
        return fft_compat.irfft_cl_s(xt, n=self.nlon, norm=norm)

    def __call__(self, x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
        return self.synthesis(fft_compat.from_complex(x), norm=norm)


def _two_sided_slices(n: int, lmax: int):
    high = math.ceil(lmax / 2)
    low = math.floor(lmax / 2)
    return high, low


class RealFFT3:
    """Forward 3D real FFT over the last three axes with truncation on all three."""

    def __init__(self, nd: int, nh: int, nw: int, ldmax: int | None = None, lhmax: int | None = None, lwmax: int | None = None):
        self.nd, self.nh, self.nw = nd, nh, nw
        self.ldmax = min(ldmax or nd, nd)
        self.lhmax = min(lhmax or nh, nh)
        self.lwmax = min(lwmax or nw // 2 + 1, nw // 2 + 1)

        self.ldmax_high, self.ldmax_low = _two_sided_slices(nd, self.ldmax)
        self.lhmax_high, self.lhmax_low = _two_sided_slices(nh, self.lhmax)

        self.truncate = not ((self.ldmax == nd) and (self.lhmax == nh) and (self.lwmax == nw // 2 + 1))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = fft_compat.rfft(x, n=self.nw, axis=-1, norm="ortho")
        y = fft_compat.fft(y, n=self.nh, axis=-2, norm="ortho")
        y = fft_compat.fft(y, n=self.nd, axis=-3, norm="ortho")
        if self.truncate:
            y = jnp.concatenate((y[..., : self.ldmax_high, :, :], y[..., y.shape[-3] - self.ldmax_low :, :, :]), axis=-3)
            y = jnp.concatenate((y[..., : self.lhmax_high, :], y[..., y.shape[-2] - self.lhmax_low :, :]), axis=-2)
            y = y[..., : self.lwmax]
        return y


class InverseRealFFT3:
    def __init__(self, nd: int, nh: int, nw: int, ldmax: int | None = None, lhmax: int | None = None, lwmax: int | None = None):
        self.nd, self.nh, self.nw = nd, nh, nw
        self.ldmax = min(ldmax or nd, nd)
        self.lhmax = min(lhmax or nh, nh)
        self.lwmax = min(lwmax or nw // 2 + 1, nw // 2 + 1)

        self.ldmax_high, self.ldmax_low = _two_sided_slices(nd, self.ldmax)
        self.lhmax_high, self.lhmax_low = _two_sided_slices(nh, self.lhmax)

        self.truncate = not ((self.ldmax == nd) and (self.lhmax == nh) and (self.lwmax == nw // 2 + 1))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.truncate:
            # pad d axis between positive and negative frequency blocks
            xh = x[..., : self.ldmax_high, :, :]
            xl = x[..., x.shape[-3] - self.ldmax_low :, :, :]
            pad = [(0, 0)] * (x.ndim - 3) + [(0, self.nd - self.ldmax), (0, 0), (0, 0)]
            x = jnp.concatenate([jnp.pad(xh, pad), xl], axis=-3)
            # pad h axis
            xh = x[..., : self.lhmax_high, :]
            xl = x[..., x.shape[-2] - self.lhmax_low :, :]
            pad = [(0, 0)] * (x.ndim - 2) + [(0, self.nh - self.lhmax), (0, 0)]
            x = jnp.concatenate([jnp.pad(xh, pad), xl], axis=-2)
        x = fft_compat.ifft(x, n=self.nd, axis=-3, norm="ortho")
        x = fft_compat.ifft(x, n=self.nh, axis=-2, norm="ortho")
        return fft_compat.irfft(x, n=self.nw, axis=-1, norm="ortho")
