"""Vector spherical harmonic transforms (TPU-native).

Transforms tangent vector fields on S^2 between grid space and the
spheroidal/toroidal (curl-free / divergence-free) harmonic basis

    Psi_lm = grad Y_lm / sqrt(l(l+1)),   Phi_lm = r x grad Y_lm / sqrt(l(l+1))

replacing the external torch-harmonics ``RealVectorSHT`` /
``InverseRealVectorSHT`` pair the reference binds in its vorticity/divergence
and Sobolev losses (makani/utils/losses/base_loss.py VortDivBaseLoss /
GradientBaseLoss). Same factorization as the scalar SHT: longitude FFT, then
a latitude contraction — here against the derivative tables

    D[m, l] = (d Pbar_l^m / d theta) / sqrt(l(l+1))
    Q[m, l] = (m Pbar_l^m / sin theta) / sqrt(l(l+1))

(see ``precompute_dlegpoly``; pole-exact). For F = (F_theta, F_phi):

    xs[l,m] = sum_j w_j ( Fhat_theta D - i Fhat_phi Q )     (spheroidal)
    xt[l,m] = sum_j w_j ( i Fhat_theta Q + Fhat_phi D )     (toroidal)

and synthesis is the adjoint. All device arithmetic is split-complex
(trailing re/im axis) — the axon TPU backend has no complex dtypes.

Layout: grid fields ``(..., 2, nlat, nlon)`` with index 0 = theta-component
(southward, colatitude convention) and 1 = phi-component (eastward);
coefficients ``(..., 2, lmax, mmax)`` with index 0 = spheroidal, 1 = toroidal.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import fft_compat
from .legendre import precompute_dlegpoly
from .precision import transform_precision
from .quadrature import precompute_latitudes

__all__ = ["RealVectorSHT", "InverseRealVectorSHT"]


def _contract_analysis(xf2, table):
    from .precision import maybe_cast_table

    return jnp.einsum("...kmr,mlk->...lmr", xf2, maybe_cast_table(table, xf2), precision=transform_precision())


def _contract_synthesis(c2, table):
    from .precision import maybe_cast_table

    return jnp.einsum("...lmr,mlk->...kmr", c2, maybe_cast_table(table, c2), precision=transform_precision())


def _mul_i(z2):
    """i * z in split-complex: (re, im) -> (-im, re)."""
    return jnp.stack([-z2[..., 1], z2[..., 0]], axis=-1)


class RealVectorSHT:
    """Analysis: real tangent field (..., 2, nlat, nlon) -> spheroidal/toroidal
    coefficients (..., 2, lmax, mmax) (complex via ``__call__``, split via
    ``analysis``)."""

    def __init__(self, nlat: int, nlon: int, lmax: int | None = None, mmax: int | None = None, grid: str = "equiangular", norm: str = "ortho", csphase: bool = True):
        self.nlat = nlat
        self.nlon = nlon
        self.grid = grid
        self.lmax = min(lmax or nlat, nlat)
        self.mmax = min(mmax or nlon // 2 + 1, nlon // 2 + 1)

        theta, w = precompute_latitudes(nlat, grid=grid)
        dpct = precompute_dlegpoly(self.mmax, self.lmax, theta, norm=norm, csphase=csphase)
        weights = 2.0 * np.pi * dpct * w[None, None, None, :]
        # numpy (not jnp): transform objects may be built inside jit traces
        self._wd = weights[0].astype(np.float32)
        self._wq = weights[1].astype(np.float32)

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """Split-complex: (..., 2, nlat, nlon) -> (..., 2, lmax, mmax, 2)."""
        xf2 = fft_compat.rfft_s(x, n=self.nlon, axis=-1, norm="forward")
        xf2 = xf2[..., : self.mmax, :]
        xt_, xp_ = xf2[..., 0, :, :, :], xf2[..., 1, :, :, :]

        td_t = _contract_analysis(xt_, self._wd)
        tq_t = _contract_analysis(xt_, self._wq)
        td_p = _contract_analysis(xp_, self._wd)
        tq_p = _contract_analysis(xp_, self._wq)

        xs = td_t - _mul_i(tq_p)
        xt = _mul_i(tq_t) + td_p
        return jnp.stack([xs, xt], axis=-4)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return fft_compat.to_complex(self.analysis(x))


class InverseRealVectorSHT:
    """Synthesis: spheroidal/toroidal coefficients (..., 2, lmax, mmax) ->
    real tangent field (..., 2, nlat, nlon)."""

    def __init__(self, nlat: int, nlon: int, lmax: int | None = None, mmax: int | None = None, grid: str = "equiangular", norm: str = "ortho", csphase: bool = True):
        self.nlat = nlat
        self.nlon = nlon
        self.grid = grid
        self.lmax = min(lmax or nlat, nlat)
        self.mmax = min(mmax or nlon // 2 + 1, nlon // 2 + 1)

        theta, _ = precompute_latitudes(nlat, grid=grid)
        dpct = precompute_dlegpoly(self.mmax, self.lmax, theta, norm=norm, inverse=True, csphase=csphase)
        self._d = dpct[0].astype(np.float32)
        self._q = dpct[1].astype(np.float32)

    def synthesis(self, c2: jnp.ndarray) -> jnp.ndarray:
        """Split-complex: (..., 2, lmax, mmax, 2) -> real (..., 2, nlat, nlon)."""
        xs, xt = c2[..., 0, :, :, :], c2[..., 1, :, :, :]

        ftheta = _contract_synthesis(xs, self._d) - _mul_i(_contract_synthesis(xt, self._q))
        fphi = _mul_i(_contract_synthesis(xs, self._q)) + _contract_synthesis(xt, self._d)

        xf2 = jnp.stack([ftheta, fphi], axis=-4)
        return fft_compat.irfft_s(xf2, n=self.nlon, axis=-1, norm="forward")

    def __call__(self, coeff: jnp.ndarray) -> jnp.ndarray:
        return self.synthesis(fft_compat.from_complex(coeff))
