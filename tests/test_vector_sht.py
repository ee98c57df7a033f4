"""Vector SHT tests (the reference delegates these to torch-harmonics;
validated here against analytic vector harmonics and round-trip identities)."""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.ops.quadrature import precompute_latitudes
from makani_tpu.ops.vector_sht import InverseRealVectorSHT, RealVectorSHT


@pytest.mark.parametrize("grid", ["legendre-gauss", "equiangular"])
def test_gradient_field_analytic(grid):
    """F = grad(cos theta) = -sin theta e_theta has a single spheroidal
    coefficient xs[1,0] = sqrt(l(l+1)) * f_10 = sqrt(2) sqrt(4pi/3)."""
    nlat, nlon, L = 32, 64, 16
    vsht = RealVectorSHT(nlat, nlon, lmax=L, mmax=L, grid=grid)
    theta, _ = precompute_latitudes(nlat, grid=grid)
    F = np.zeros((1, 2, nlat, nlon), np.float32)
    F[0, 0] = -np.sin(theta)[:, None]
    c = np.asarray(vsht(jnp.asarray(F)))
    expected = np.sqrt(2.0) * np.sqrt(4 * np.pi / 3)
    np.testing.assert_allclose(c[0, 0, 1, 0].real, expected, rtol=1e-5)
    leak = np.abs(c[0]).sum() - abs(c[0, 0, 1, 0])
    assert leak < 1e-4


def test_toroidal_field_analytic():
    """F = r x grad(cos theta) = -sin theta e_phi -> pure toroidal xt[1,0]."""
    nlat, nlon, L = 32, 64, 16
    vsht = RealVectorSHT(nlat, nlon, lmax=L, mmax=L, grid="legendre-gauss")
    theta, _ = precompute_latitudes(nlat, grid="legendre-gauss")
    F = np.zeros((1, 2, nlat, nlon), np.float32)
    F[0, 1] = -np.sin(theta)[:, None]
    c = np.asarray(vsht(jnp.asarray(F)))
    expected = np.sqrt(2.0) * np.sqrt(4 * np.pi / 3)
    np.testing.assert_allclose(c[0, 1, 1, 0].real, expected, rtol=1e-5)
    leak = np.abs(c[0]).sum() - abs(c[0, 1, 1, 0])
    assert leak < 1e-4


def test_roundtrip_band_limited():
    """synthesis -> analysis is the identity on band-limited tangent fields."""
    nlat, nlon, L = 32, 64, 16
    vsht = RealVectorSHT(nlat, nlon, lmax=L, mmax=L, grid="legendre-gauss")
    ivsht = InverseRealVectorSHT(nlat, nlon, lmax=L, mmax=L, grid="legendre-gauss")
    rng = np.random.RandomState(0)
    coef = rng.randn(2, 2, L, L) + 1j * rng.randn(2, 2, L, L)
    ls, ms = np.arange(L)[:, None], np.arange(L)[None, :]
    coef = np.where(ms <= ls, coef, 0)
    coef[..., 0, :] = 0  # no l=0 tangent component
    coef[..., :, 0] = coef[..., :, 0].real
    f = ivsht(jnp.asarray(coef, jnp.complex64))
    back = np.asarray(vsht(f))
    np.testing.assert_allclose(back, coef, atol=1e-5)


def test_dlegpoly_matches_finite_differences():
    from makani_tpu.ops.legendre import precompute_dlegpoly, precompute_legpoly

    theta = np.linspace(0.05, np.pi - 0.05, 37)
    L = 8
    dp = precompute_dlegpoly(L, L, theta)
    eps = 1e-6
    fd = (precompute_legpoly(L, L, theta + eps) - precompute_legpoly(L, L, theta - eps)) / (2 * eps)
    ll = np.arange(L)
    scale = np.where(ll > 0, np.sqrt(ll * (ll + 1.0)), 1.0)
    got = dp[0] * scale[None, :, None]
    want = np.where(ll[None, :, None] > 0, fd, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-7)
    # pole-exactness: finite at theta = 0, pi
    assert np.isfinite(precompute_dlegpoly(L, L, np.array([0.0, np.pi]))).all()
