"""Spherical harmonic transform: numerics.

Validates the TPU SHT against first principles (the reference validates
against torch-harmonics, which is unavailable here; these properties pin down
the same convention):
  * Legendre tables match scipy's orthonormal spherical harmonics,
  * analysis of Y_l^m fields yields unit coefficients,
  * synthesis -> analysis round trips exactly for band-limited spectra,
  * grid -> spectral -> grid round trips for band-limited fields.
"""

import numpy as np
import pytest
import scipy.special as sps

from makani_tpu.ops.legendre import precompute_legpoly
from makani_tpu.ops.quadrature import precompute_latitudes
from makani_tpu.ops.sht import RealSHT, InverseRealSHT


def _scipy_sph_harm(l, m, theta):
    """Orthonormal Y_l^m(theta, 0) (real part = normalized Legendre, incl. CS phase)."""
    if hasattr(sps, "sph_harm_y"):
        return np.real(sps.sph_harm_y(l, m, theta, 0.0))
    return np.real(sps.sph_harm(m, l, 0.0, theta))


@pytest.mark.parametrize("l,m", [(0, 0), (1, 0), (1, 1), (5, 3), (10, 10), (17, 2)])
def test_legendre_matches_scipy(l, m):
    theta, _ = precompute_latitudes(37, grid="legendre-gauss")
    pct = precompute_legpoly(m + 1, l + 1, theta)
    expected = _scipy_sph_harm(l, m, theta)
    np.testing.assert_allclose(pct[m, l], expected, atol=1e-12)


def _random_bandlimited_coeffs(rng, lmax, mmax, batch=()):
    """Random spectrum valid for a real field: m=0 column real, m>l zero."""
    coeff = rng.randn(*batch, lmax, mmax) + 1j * rng.randn(*batch, lmax, mmax)
    coeff[..., :, 0] = coeff[..., :, 0].real
    ls = np.arange(lmax)[:, None]
    ms = np.arange(mmax)[None, :]
    coeff = np.where(ms <= ls, coeff, 0.0)
    return coeff.astype(np.complex64)


@pytest.mark.parametrize(
    "grid,nlat,nlon,lmax",
    [
        ("legendre-gauss", 24, 48, 24),
        ("legendre-gauss", 33, 66, 24),
        ("equiangular", 33, 64, 16),
        ("equiangular", 721 // 10 + 1, 144, 32),
    ],
)
def test_synthesis_analysis_roundtrip(grid, nlat, nlon, lmax):
    mmax = min(lmax, nlon // 2 + 1)
    rng = np.random.RandomState(42)
    coeff = _random_bandlimited_coeffs(rng, lmax, mmax, batch=(2,))

    isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
    sht = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)

    field = np.asarray(isht(coeff))
    assert field.shape == (2, nlat, nlon)
    assert field.dtype == np.float32

    coeff2 = np.asarray(sht(field))
    np.testing.assert_allclose(coeff2, coeff, atol=2e-4)


def test_constant_field_coefficient():
    sht = RealSHT(32, 64, grid="legendre-gauss")
    x = np.full((32, 64), 3.0, dtype=np.float32)
    coeff = np.array(sht(x))
    np.testing.assert_allclose(coeff[0, 0], 3.0 * np.sqrt(4 * np.pi), rtol=1e-5)
    coeff[0, 0] = 0.0
    assert np.max(np.abs(coeff)) < 1e-3


@pytest.mark.parametrize("l,m", [(3, 0), (4, 2), (7, 7)])
def test_single_harmonic_analysis(l, m):
    """Field 2*Re(Y_l^m) (or Y_l^0) must give a unit coefficient at (l, m)."""
    nlat, nlon = 24, 48
    theta, _ = precompute_latitudes(nlat, grid="legendre-gauss")
    phi = 2 * np.pi * np.arange(nlon) / nlon
    pbar = _scipy_sph_harm(l, m, theta)
    if m == 0:
        field = np.tile(pbar[:, None], (1, nlon))
    else:
        field = 2.0 * pbar[:, None] * np.cos(m * phi)[None, :]

    sht = RealSHT(nlat, nlon, grid="legendre-gauss")
    coeff = np.asarray(sht(field.astype(np.float32)))
    expected = np.zeros_like(coeff)
    expected[l, m] = 1.0
    np.testing.assert_allclose(coeff, expected, atol=5e-5)


def test_grid_roundtrip_bandlimited():
    """ISHT(SHT(x)) == x when x is band-limited to the kept modes."""
    nlat, nlon, lmax = 32, 64, 20
    rng = np.random.RandomState(7)
    coeff = _random_bandlimited_coeffs(rng, lmax, lmax)
    isht_full = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="legendre-gauss")
    x = np.asarray(isht_full(coeff))

    sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="legendre-gauss")
    isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="legendre-gauss")
    x2 = np.asarray(isht(sht(x)))
    np.testing.assert_allclose(x2, x, atol=2e-4)


def test_batched_and_jitted():
    import jax

    # equiangular CC quadrature is exact only up to lmax <= (nlat+1)//2
    nlat, nlon, lmax = 16, 32, 8
    sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="equiangular")
    isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="equiangular")
    x = np.random.RandomState(0).randn(2, 3, nlat, nlon).astype(np.float32)

    roundtrip = jax.jit(lambda y: isht(sht(y)))
    out = np.asarray(roundtrip(x))
    assert out.shape == x.shape
    # not exactly band-limited, so just check the projection is idempotent
    out2 = np.asarray(roundtrip(out))
    np.testing.assert_allclose(out2, out, atol=1e-4)
