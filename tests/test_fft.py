"""Planar FFT wrappers: truncation and round-trip semantics.

Pins the same behavior as the reference wrappers
(makani/models/common/fft.py): two-sided latitude truncation, one-sided
longitude truncation, and band-limited projection on round trip.
"""

import numpy as np

from makani_tpu.ops.fft import (
    RealFFT1,
    InverseRealFFT1,
    RealFFT2,
    InverseRealFFT2,
    RealFFT3,
    InverseRealFFT3,
)


def test_fft1_roundtrip():
    x = np.random.RandomState(0).randn(4, 33).astype(np.float32)
    fft = RealFFT1(33)
    ifft = InverseRealFFT1(33)
    np.testing.assert_allclose(np.asarray(ifft(fft(x))), x, atol=1e-5)


def test_fft2_roundtrip_full():
    x = np.random.RandomState(0).randn(2, 3, 16, 32).astype(np.float32)
    fft = RealFFT2(16, 32)
    ifft = InverseRealFFT2(16, 32)
    y = fft(x)
    assert y.shape == (2, 3, 16, 17)
    np.testing.assert_allclose(np.asarray(ifft(y)), x, atol=1e-5)


def test_fft2_truncation_is_projection():
    nlat, nlon, lmax, mmax = 16, 32, 9, 8
    x = np.random.RandomState(1).randn(2, nlat, nlon).astype(np.float32)
    fft = RealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
    ifft = InverseRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)

    y = fft(x)
    assert y.shape == (2, lmax, mmax)

    x1 = np.asarray(ifft(y))
    assert x1.shape == x.shape
    # projection: applying again must be idempotent
    x2 = np.asarray(ifft(fft(x1)))
    np.testing.assert_allclose(x2, x1, atol=1e-5)

    # two-sided truncation: verify against direct spectral zeroing
    spec = np.fft.rfft2(x, axes=(-2, -1), norm="ortho")
    mask = np.zeros_like(spec)
    high = (lmax + 1) // 2
    low = lmax // 2
    mask[..., :high, :mmax] = 1.0
    mask[..., nlat - low :, :mmax] = 1.0
    expected = np.fft.irfft2(spec * mask, s=(nlat, nlon), axes=(-2, -1), norm="ortho")
    np.testing.assert_allclose(x1, expected.astype(np.float32), atol=1e-5)


def test_fft3_roundtrip_truncated():
    nd, nh, nw = 8, 12, 16
    x = np.random.RandomState(2).randn(2, nd, nh, nw).astype(np.float32)
    fft = RealFFT3(nd, nh, nw, ldmax=5, lhmax=7, lwmax=6)
    ifft = InverseRealFFT3(nd, nh, nw, ldmax=5, lhmax=7, lwmax=6)
    y = fft(x)
    assert y.shape == (2, 5, 7, 6)
    x1 = np.asarray(ifft(y))
    x2 = np.asarray(ifft(fft(x1)))
    np.testing.assert_allclose(x2, x1, atol=1e-5)
