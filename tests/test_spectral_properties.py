"""Symmetry properties of the spectral pipeline.

Pins the mathematical structure the SFNO design relies on (SURVEY §2.2:
dhconv is the rotation-equivariant per-degree operator; ref
spectral_convolution.py):

* longitude-rotation equivariance of SpectralConv for both ``dhconv``
  (real per-l weight) and ``diagonal`` (complex per-(l,m) weight) — both
  are m-diagonal, so they commute with azimuthal rotation;
* the SHT phase-shift theorem: rotating the field by k grid columns
  multiplies coefficient (l, m) by exp(-i m k 2π/W);
* zonal invariance: a zonal (m=0) field stays zonal through the conv.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.common.spectral_convolution import SpectralConv
from makani_tpu.ops.sht import InverseRealSHT, RealSHT

H, W, C = 24, 48, 4


def _conv(operator_type):
    fwd = RealSHT(H, W, grid="equiangular")
    inv = InverseRealSHT(H, W, grid="equiangular")
    return SpectralConv(
        forward_transform=fwd,
        inverse_transform=inv,
        in_channels=C,
        out_channels=C,
        operator_type=operator_type,
    )


@pytest.mark.parametrize("operator_type", ["dhconv", "diagonal"])
def test_spectral_conv_rotation_equivariance(operator_type):
    """shift(conv(x)) == conv(shift(x)) for cyclic longitude shifts: the
    weights act per-m (diagonal in m), so they commute with rotation."""
    conv = _conv(operator_type)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, C, H, W)).astype(np.float32))
    p = conv.init(jax.random.PRNGKey(0), x)

    y, _ = conv.apply(p, x)
    for k in (1, 7, W // 2):
        y_shift, _ = conv.apply(p, jnp.roll(x, k, axis=-1))
        np.testing.assert_allclose(
            np.asarray(y_shift), np.asarray(jnp.roll(y, k, axis=-1)), atol=2e-5,
            err_msg=f"{operator_type} shift {k}",
        )


def test_sht_phase_shift_theorem():
    """Coefficients of the rotated field are the phase-multiplied originals."""
    sht = RealSHT(H, W, grid="legendre-gauss")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 1, H, W)).astype(np.float64))
    c0 = np.asarray(sht(x))  # (..., lmax, mmax) split or complex per impl
    k = 5
    ck = np.asarray(sht(jnp.roll(x, k, axis=-1)))
    m = np.arange(c0.shape[-2] if c0.shape[-1] == 2 else c0.shape[-1])
    if c0.shape[-1] == 2:  # split-complex last-dim layout (..., l, m, 2)
        z0 = c0[..., 0] + 1j * c0[..., 1]
        zk = ck[..., 0] + 1j * ck[..., 1]
        m = np.arange(z0.shape[-1])
    else:
        z0, zk = c0, ck
    phase = np.exp(-1j * m * k * 2 * np.pi / W)
    np.testing.assert_allclose(zk, z0 * phase, atol=5e-7)  # complex64 transform


@pytest.mark.parametrize("operator_type", ["dhconv", "diagonal"])
def test_zonal_field_stays_zonal(operator_type):
    """m=0 input has only m=0 coefficients; an m-diagonal operator cannot
    create m != 0 content, so the output is longitude-constant too."""
    conv = _conv(operator_type)
    theta = np.linspace(0, np.pi, H)
    x = np.broadcast_to(np.cos(theta)[:, None], (H, W)).astype(np.float32)
    x = jnp.asarray(np.broadcast_to(x, (1, C, H, W)))
    p = conv.init(jax.random.PRNGKey(1), x)
    y, _ = conv.apply(p, x)
    y = np.asarray(y)
    np.testing.assert_allclose(y, np.broadcast_to(y[..., :1], y.shape), atol=2e-6)


def test_dhconv_real_weight_preserves_realness_structure():
    """dhconv's per-degree real weight maps real fields to real fields with
    zero imaginary leakage (the contraction operates on split-complex
    coefficients; conjugate symmetry of the real SHT must survive)."""
    conv = _conv("dhconv")
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, C, H, W)).astype(np.float32))
    p = conv.init(jax.random.PRNGKey(2), x)
    y, _ = conv.apply(p, x)
    assert np.asarray(y).dtype == np.float32
    assert np.all(np.isfinite(np.asarray(y)))


def test_rotation_equivariance_survives_grid_mismatch_residual():
    """With distinct in/out grids the residual is regridded; equivariance in
    longitude still holds (regridding is zonally symmetric)."""
    fwd = RealSHT(H, W, grid="equiangular")
    inv = InverseRealSHT(H, W, grid="legendre-gauss")
    conv = SpectralConv(
        forward_transform=fwd, inverse_transform=inv,
        in_channels=C, out_channels=C, operator_type="dhconv",
    )
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, C, H, W)).astype(np.float32))
    p = conv.init(jax.random.PRNGKey(3), x)
    y, r = conv.apply(p, x)
    ys, rs = conv.apply(p, jnp.roll(x, 3, axis=-1))
    np.testing.assert_allclose(np.asarray(ys), np.asarray(jnp.roll(y, 3, axis=-1)), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(jnp.roll(r, 3, axis=-1)), atol=2e-5)
