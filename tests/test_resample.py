"""Spherical bilinear resampling (torch-harmonics ResampleS2 parity
surface; bound by FCN3's encoder/decoder grid moves). Checks interpolation
exactness classes (constants, fields linear in colatitude, periodic
longitude lerp), identity on matching grids, grid-type conversions, and
smooth-field round-trip accuracy.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.ops.quadrature import precompute_latitudes
from makani_tpu.ops.resample import ResampleS2


def test_identity_on_same_grid():
    r = ResampleS2(16, 32, 16, 32)
    x = np.random.default_rng(0).standard_normal((2, 3, 16, 32)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(r(jnp.asarray(x))), x, atol=1e-6)


def test_constant_preserved_any_grids():
    for gi, go in [("equiangular", "equiangular"), ("equiangular", "legendre-gauss"), ("legendre-gauss", "equiangular")]:
        r = ResampleS2(14, 28, 27, 54, grid_in=gi, grid_out=go)
        x = jnp.full((1, 1, 14, 28), 3.25, jnp.float32)
        np.testing.assert_allclose(np.asarray(r(x)), 3.25, atol=1e-6)


def test_linear_in_colatitude_exact_interior():
    """Bilinear interpolation reproduces fields linear in theta exactly on
    interior output latitudes (clipping only affects extrapolated poles)."""
    nlat_in, nlat_out = 20, 37
    ti, _ = precompute_latitudes(nlat_in, grid="equiangular")
    to, _ = precompute_latitudes(nlat_out, grid="equiangular")
    x = np.broadcast_to(ti[:, None], (nlat_in, 8)).astype(np.float32)[None]
    r = ResampleS2(nlat_in, 8, nlat_out, 8)
    y = np.asarray(r(jnp.asarray(x)))[0]
    interior = (to >= ti[0]) & (to <= ti[-1])
    np.testing.assert_allclose(y[interior], np.broadcast_to(to[interior, None], (interior.sum(), 8)), atol=1e-5)
    # extrapolated rows are clipped to the boundary value, not extrapolated
    assert np.all(y[~interior] >= ti[0] - 1e-6) and np.all(y[~interior] <= ti[-1] + 1e-6)


def test_longitude_lerp_periodic_and_exact_on_multiples():
    """Upsampling longitude by an integer factor keeps the original columns
    exactly and wraps periodically at the seam."""
    nlon_in, factor = 12, 3
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1, 6, nlon_in)).astype(np.float32)
    r = ResampleS2(6, nlon_in, 6, nlon_in * factor)
    y = np.asarray(r(jnp.asarray(x)))
    np.testing.assert_allclose(y[..., ::factor], x, atol=1e-6)
    # the column between the last and first input columns lerps across the seam
    w = 1.0 / factor
    want = x[..., -1] * (1 - w) + x[..., 0] * w
    np.testing.assert_allclose(y[..., -factor + 1], want, atol=1e-6)


def test_smooth_field_round_trip():
    """Down-then-up on a band-limited field stays within interpolation error."""
    H, W = 64, 128
    theta, _ = precompute_latitudes(H, grid="equiangular")
    phi = np.arange(W) * (2 * np.pi / W)
    f = (np.sin(theta)[:, None] * np.cos(2 * phi)[None, :] + np.cos(theta)[:, None]).astype(np.float32)[None, None]
    down = ResampleS2(H, W, H // 2, W // 2)
    up = ResampleS2(H // 2, W // 2, H, W)
    g = np.asarray(up(down(jnp.asarray(f))))
    # interior error is O(h^2); exclude the two clipped polar rows
    assert np.abs((g - f)[..., 2:-2, :]).max() < 0.01


def test_gauss_grid_conversion_accuracy():
    """equiangular -> legendre-gauss -> equiangular on a smooth zonal field."""
    H, W = 48, 96
    theta, _ = precompute_latitudes(H, grid="equiangular")
    f = np.cos(2 * theta).astype(np.float32)[None, :, None] * np.ones((1, H, W), np.float32)
    to_lg = ResampleS2(H, W, H, W, grid_in="equiangular", grid_out="legendre-gauss")
    back = ResampleS2(H, W, H, W, grid_in="legendre-gauss", grid_out="equiangular")
    g = np.asarray(back(to_lg(jnp.asarray(f))))
    assert np.abs((g - f)[:, 2:-2]).max() < 0.01


def test_dtype_and_shape_preserved():
    r = ResampleS2(10, 20, 15, 30)
    x = jnp.zeros((2, 5, 10, 20), jnp.bfloat16)
    y = r(x)
    assert y.shape == (2, 5, 15, 30)
    assert y.dtype == jnp.bfloat16


def test_unsupported_mode_raises():
    with pytest.raises(NotImplementedError):
        ResampleS2(8, 16, 8, 16, mode="bicubic")
