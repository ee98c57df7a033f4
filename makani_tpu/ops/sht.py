"""Spherical harmonic transforms (TPU-native).

From-scratch JAX implementation of the real spherical harmonic transform pair
used by the spectral models. The factorization is the classical one: a real
FFT in longitude followed by a per-order Legendre contraction in latitude,

    coeff[l, m] = 2 pi * sum_j w_j * Pbar_l^m(cos theta_j) * rfft(x)[theta_j, m]

with orthonormal harmonics and quadrature weights exact for band-limited
fields (Legendre-Gauss) or equiangular grids (Clenshaw-Curtis).

This replaces the external torch-harmonics ``RealSHT`` / ``InverseRealSHT``
CUDA path the reference binds at ``makani/models/networks/sfnonet.py:792-805``.
On TPU the Legendre stage is a batched matmul that maps straight onto the MXU
(`jnp.einsum` with HIGHEST precision keeps the long quadrature accumulation in
fp32); the FFT stage lowers to the XLA FFT. Interface (``nlat``, ``nlon``,
``lmax``, ``mmax``, ``grid`` attributes; ``__call__``) mirrors the reference so
model code can treat SHT and FFT transforms interchangeably.

The Legendre tables are precomputed once in float64 numpy and stored as fp32
device constants; under ``jit`` they fold into the executable and are shared
between all layers that use the same transform object.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .precision import maybe_cast_table, transform_precision

from . import fft_compat
from .legendre import precompute_legpoly
from .quadrature import precompute_latitudes

__all__ = ["RealSHT", "InverseRealSHT"]

# The Legendre contraction is a long accumulation over quadrature points; run
# the MXU in full fp32 (bf16x6 passes) rather than the default bf16.


def _analysis_contract_s(xf2: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """split (..., nlat, mmax, 2) x (mmax, lmax, nlat) -> split (..., lmax, mmax, 2)."""
    return jnp.einsum("...kmr,mlk->...lmr", xf2, maybe_cast_table(weights, xf2), precision=transform_precision())


def _synthesis_contract_s(c2: jnp.ndarray, pct: jnp.ndarray) -> jnp.ndarray:
    """split (..., lmax, mmax, 2) x (mmax, lmax, nlat) -> split (..., nlat, mmax, 2)."""
    return jnp.einsum("...lmr,mlk->...kmr", c2, maybe_cast_table(pct, c2), precision=transform_precision())


def _analysis_contract_cl_s(xf2: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """channels-last: split (..., nlat, mmax, C, 2) x (mmax, lmax, nlat) -> (..., lmax, mmax, C, 2)."""
    return jnp.einsum("...kmcr,mlk->...lmcr", xf2, maybe_cast_table(weights, xf2), precision=transform_precision())


def _synthesis_contract_cl_s(c2: jnp.ndarray, pct: jnp.ndarray) -> jnp.ndarray:
    """channels-last: split (..., lmax, mmax, C, 2) x (mmax, lmax, nlat) -> (..., nlat, mmax, C, 2)."""
    return jnp.einsum("...lmcr,mlk->...kmcr", c2, maybe_cast_table(pct, c2), precision=transform_precision())


class RealSHT:
    """Forward (analysis) real spherical harmonic transform.

    Maps a real field of shape ``(..., nlat, nlon)`` to complex coefficients of
    shape ``(..., lmax, mmax)``; entries with ``m > l`` are zero (triangular
    truncation kept dense for TPU-friendly static shapes).
    """

    def __init__(self, nlat: int, nlon: int, lmax: int | None = None, mmax: int | None = None, grid: str = "equiangular", norm: str = "ortho", csphase: bool = True):
        self.nlat = nlat
        self.nlon = nlon
        self.grid = grid
        self.norm = norm
        self.lmax = min(lmax or nlat, nlat)
        self.mmax = min(mmax or nlon // 2 + 1, nlon // 2 + 1)

        theta, w = precompute_latitudes(nlat, grid=grid)
        pct = precompute_legpoly(self.mmax, self.lmax, theta, norm=norm, csphase=csphase)
        # fold quadrature weights and the 2*pi longitude measure into the table
        weights = 2.0 * np.pi * pct * w[None, None, :]
        # kept as numpy: transform objects may be constructed inside a jit
        # trace (flax setup), where creating device arrays would leak tracers;
        # numpy constants fold into the executable at call sites instead.
        self._weights = weights.astype(np.float32)

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """Split-complex analysis: real (..., nlat, nlon) -> (..., lmax, mmax, 2).

        No complex dtype touches the device (the axon TPU backend has no
        complex support); downstream layers consume the trailing re/im pair.
        """
        xf2 = fft_compat.rfft_s(x, n=self.nlon, axis=-1, norm="forward", mout=self.mmax)
        return _analysis_contract_s(xf2, self._weights)

    def analysis_cl(self, x: jnp.ndarray) -> jnp.ndarray:
        """Channels-last analysis: real (..., nlat, nlon, C) -> (..., lmax, mmax, C, 2)."""
        xf2 = fft_compat.rfft_cl_s(x, n=self.nlon, norm="forward", mout=self.mmax)
        return _analysis_contract_cl_s(xf2, self._weights)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return fft_compat.to_complex(self.analysis(x))


class InverseRealSHT:
    """Inverse (synthesis) real spherical harmonic transform.

    Maps complex coefficients of shape ``(..., lmax, mmax)`` to a real field of
    shape ``(..., nlat, nlon)``.
    """

    def __init__(self, nlat: int, nlon: int, lmax: int | None = None, mmax: int | None = None, grid: str = "equiangular", norm: str = "ortho", csphase: bool = True):
        self.nlat = nlat
        self.nlon = nlon
        self.grid = grid
        self.norm = norm
        self.lmax = min(lmax or nlat, nlat)
        self.mmax = min(mmax or nlon // 2 + 1, nlon // 2 + 1)

        theta, _ = precompute_latitudes(nlat, grid=grid)
        pct = precompute_legpoly(self.mmax, self.lmax, theta, norm=norm, inverse=True, csphase=csphase)
        self._pct = pct.astype(np.float32)

    def synthesis(self, c2: jnp.ndarray) -> jnp.ndarray:
        """Split-complex synthesis: (..., lmax, mmax, 2) -> real (..., nlat, nlon)."""
        xf2 = _synthesis_contract_s(c2, self._pct)
        return fft_compat.irfft_s(xf2, n=self.nlon, axis=-1, norm="forward")

    def synthesis_cl(self, c2: jnp.ndarray) -> jnp.ndarray:
        """Channels-last synthesis: (..., lmax, mmax, C, 2) -> real (..., nlat, nlon, C)."""
        xf2 = _synthesis_contract_cl_s(c2, self._pct)
        return fft_compat.irfft_cl_s(xf2, n=self.nlon, norm="forward")

    def __call__(self, coeff: jnp.ndarray) -> jnp.ndarray:
        return self.synthesis(fft_compat.from_complex(coeff))
