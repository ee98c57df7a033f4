"""Distributed transforms vs serial reference on the virtual CPU mesh.

Follows the reference's distributed-test pattern (makani
tests/distributed/tests_distributed_fft.py): run the serial transform on the
full tensor, run the distributed transform over the mesh, compare outputs and
input gradients to fp32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.ops.fft import RealFFT2, InverseRealFFT2
from makani_tpu.ops.sht import RealSHT, InverseRealSHT
from makani_tpu.parallel import mesh as pmesh
from makani_tpu.parallel.transforms import (
    DistributedInverseRealFFT2,
    DistributedInverseRealSHT,
    DistributedRealFFT2,
    DistributedRealSHT,
)


MESH_CONFIGS = [
    dict(h=2, w=2),
    dict(h=4, w=1),
    dict(h=1, w=4),
    dict(h=2, w=1),
]


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def init_mesh(batch=2, **cfg):
    n = batch
    for v in cfg.values():
        n *= v
    pmesh.init(batch=batch, devices=jax.devices()[:n], **cfg)


@pytest.mark.parametrize("cfg", MESH_CONFIGS, ids=lambda c: f"h{c['h']}w{c['w']}")
@pytest.mark.parametrize("nlat,nlon,lmax", [(24, 48, 20), (18, 48, 16)])
def test_distributed_sht_matches_serial(cfg, nlat, nlon, lmax):
    init_mesh(**cfg)
    mmax = lmax

    sht = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")
    dsht = DistributedRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")

    rng = np.random.RandomState(0)
    B, C = 2, 8
    x = rng.randn(B, C, nlat, nlon).astype(np.float32)
    # distributed input is padded in latitude; pad rows must be ignored
    xpad = np.concatenate([x, rng.randn(B, C, dsht.nlat_pad - nlat, nlon).astype(np.float32)], axis=2)

    ref = np.asarray(sht(x))
    out = np.asarray(dsht(jnp.asarray(xpad)))

    assert out.shape == (B, C, dsht.lmax_pad, dsht.mmax_pad)
    np.testing.assert_allclose(out[..., :lmax, :mmax], ref, atol=1e-4)
    # padded modes must be exactly zero
    if dsht.lmax_pad > lmax:
        assert np.abs(out[..., lmax:, :]).max() == 0.0
    if dsht.mmax_pad > mmax:
        assert np.abs(out[..., :, mmax:]).max() == 0.0


@pytest.mark.parametrize("cfg", MESH_CONFIGS, ids=lambda c: f"h{c['h']}w{c['w']}")
def test_distributed_isht_matches_serial(cfg):
    init_mesh(**cfg)
    nlat, nlon, lmax = 18, 48, 16
    mmax = lmax

    isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")
    disht = DistributedInverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")

    rng = np.random.RandomState(1)
    B, C = 2, 8
    coeff = (rng.randn(B, C, lmax, mmax) + 1j * rng.randn(B, C, lmax, mmax)).astype(np.complex64)
    cpad = np.zeros((B, C, disht.lmax_pad, disht.mmax_pad), dtype=np.complex64)
    cpad[..., :lmax, :mmax] = coeff

    ref = np.asarray(isht(coeff))
    out = np.asarray(disht(jnp.asarray(cpad)))

    assert out.shape == (B, C, disht.nlat_pad, nlon)
    np.testing.assert_allclose(out[..., :nlat, :], ref, atol=1e-4)
    # padded latitude rows synthesized as zero
    if disht.nlat_pad > nlat:
        assert np.abs(out[..., nlat:, :]).max() == 0.0


def test_distributed_sht_gradients_match_serial():
    init_mesh(h=2, w=2)
    nlat, nlon, lmax = 18, 32, 12
    sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="legendre-gauss")
    dsht = DistributedRealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="legendre-gauss")

    rng = np.random.RandomState(2)
    B, C = 2, 4
    x = rng.randn(B, C, nlat, nlon).astype(np.float32)
    xpad = np.zeros((B, C, dsht.nlat_pad, nlon), dtype=np.float32)
    xpad[..., :nlat, :] = x

    # real scalar loss so grads are well-defined and identical
    def loss_serial(y):
        c = sht(y)
        return jnp.sum(jnp.abs(c) ** 2)

    def loss_dist(y):
        c = dsht(y)
        return jnp.sum(jnp.abs(c) ** 2)

    g_ref = np.asarray(jax.grad(loss_serial)(jnp.asarray(x)))
    g_dist = np.asarray(jax.grad(loss_dist)(jnp.asarray(xpad)))

    np.testing.assert_allclose(g_dist[..., :nlat, :], g_ref, atol=1e-3, rtol=1e-4)
    # no gradient into the padded rows
    if dsht.nlat_pad > nlat:
        assert np.abs(g_dist[..., nlat:, :]).max() == 0.0


def test_distributed_sht_roundtrip_under_jit():
    init_mesh(h=2, w=2)
    nlat, nlon, lmax = 20, 32, 10
    dsht = DistributedRealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="legendre-gauss")
    disht = DistributedInverseRealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="legendre-gauss")
    isht_full = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="legendre-gauss")

    rng = np.random.RandomState(3)
    coeff = (rng.randn(2, 4, lmax, lmax) + 1j * rng.randn(2, 4, lmax, lmax)).astype(np.complex64)
    coeff[..., :, 0] = coeff[..., :, 0].real
    ls = np.arange(lmax)[:, None]
    ms = np.arange(lmax)[None, :]
    coeff = np.where(ms <= ls, coeff, 0.0)
    x = np.asarray(isht_full(coeff))

    @jax.jit
    def roundtrip(y):
        return disht(dsht(y))

    out = np.asarray(roundtrip(jnp.asarray(x)))
    np.testing.assert_allclose(out[..., :nlat, :], x, atol=2e-4)


@pytest.mark.parametrize("cfg", MESH_CONFIGS, ids=lambda c: f"h{c['h']}w{c['w']}")
def test_distributed_fft2_matches_serial(cfg):
    init_mesh(**cfg)
    nlat, nlon, lmax, mmax = 16, 32, 9, 8

    fft = RealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
    dfft = DistributedRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)

    rng = np.random.RandomState(4)
    B, C = 2, 8
    x = rng.randn(B, C, nlat, nlon).astype(np.float32)

    ref = np.asarray(fft(x))
    out = np.asarray(dfft(jnp.asarray(x)))
    np.testing.assert_allclose(out[..., :lmax, :mmax], ref, atol=1e-4)

    ifft = InverseRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
    difft = DistributedInverseRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
    ref_x = np.asarray(ifft(ref))
    out_x = np.asarray(difft(jnp.asarray(out)))
    np.testing.assert_allclose(out_x, ref_x, atol=1e-4)


@pytest.mark.parametrize("cfg", MESH_CONFIGS, ids=lambda c: f"h{c['h']}w{c['w']}")
def test_distributed_sht_cl_matches_serial(cfg):
    """Channels-last distributed analysis/synthesis vs the serial _cl path
    (the layout that carries the 1.6x GEMM win to spatial distribution)."""
    init_mesh(**cfg)
    nlat, nlon, lmax = 18, 48, 16
    mmax = lmax
    sht = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")
    isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")
    dsht = DistributedRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")
    disht = DistributedInverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")

    rng = np.random.RandomState(3)
    B, C = 2, 8
    x = rng.randn(B, nlat, nlon, C).astype(np.float32)
    xpad = np.zeros((B, dsht.nlat_pad, nlon, C), np.float32)
    xpad[:, :nlat] = x

    ref = np.asarray(sht.analysis_cl(jnp.asarray(x)))  # (B, lmax, mmax, C, 2)
    out = np.asarray(dsht.analysis_cl(jnp.asarray(xpad)))
    assert out.shape == (B, dsht.lmax_pad, dsht.mmax_pad, C, 2)
    np.testing.assert_allclose(out[:, :lmax, :mmax], ref, atol=1e-4)
    if dsht.lmax_pad > lmax:
        assert np.abs(out[:, lmax:]).max() == 0.0

    # synthesis round trip through the distributed inverse
    back = np.asarray(disht.synthesis_cl(jnp.asarray(out)))
    ref_back = np.asarray(isht.synthesis_cl(jnp.asarray(ref)))
    np.testing.assert_allclose(back[:, :nlat], ref_back, atol=1e-4)
    if disht.nlat_pad > nlat:
        assert np.abs(back[:, nlat:]).max() == 0.0


@pytest.mark.parametrize("cfg", [dict(h=2, w=2), dict(h=1, w=4)], ids=lambda c: f"h{c['h']}w{c['w']}")
def test_distributed_fft2_cl_matches_serial(cfg):
    init_mesh(**cfg)
    nlat, nlon, lmax = 16, 48, 12
    mmax = lmax
    fft = RealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
    ifft = InverseRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
    dfft = DistributedRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
    difft = DistributedInverseRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)

    rng = np.random.RandomState(4)
    B, C = 2, 8
    x = rng.randn(B, nlat, nlon, C).astype(np.float32)

    ref = np.asarray(fft.analysis_cl(jnp.asarray(x)))
    out = np.asarray(dfft.analysis_cl(jnp.asarray(x)))
    assert out.shape == (B, dfft.lmax_pad, dfft.mmax_pad, C, 2)
    np.testing.assert_allclose(out[:, :lmax, :mmax], ref[:, :lmax, :mmax], atol=1e-4)

    back = np.asarray(difft.synthesis_cl(jnp.asarray(out)))
    ref_back = np.asarray(ifft.synthesis_cl(jnp.asarray(ref)))
    np.testing.assert_allclose(back, ref_back, atol=1e-4)


def test_distributed_sht_cl_gradients_match_serial():
    init_mesh(h=2, w=2)
    nlat, nlon, lmax = 18, 32, 12
    sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="legendre-gauss")
    dsht = DistributedRealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="legendre-gauss")

    rng = np.random.RandomState(5)
    B, C = 2, 4
    x = rng.randn(B, nlat, nlon, C).astype(np.float32)
    xpad = np.zeros((B, dsht.nlat_pad, nlon, C), np.float32)
    xpad[:, :nlat] = x

    g_ref = np.asarray(jax.grad(lambda y: jnp.sum(sht.analysis_cl(y) ** 2))(jnp.asarray(x)))
    g_out = np.asarray(jax.grad(lambda y: jnp.sum(dsht.analysis_cl(y) ** 2))(jnp.asarray(xpad)))
    np.testing.assert_allclose(g_out[:, :nlat], g_ref, atol=1e-4)


@pytest.mark.parametrize("cfg", [dict(h=2, w=2), dict(h=1, w=4)], ids=lambda c: f"h{c['h']}w{c['w']}")
def test_distributed_sht_odd_channel_count(cfg):
    """C not divisible by w (FCN3's 677-wide processor state): the Ulysses
    channel all_to_all must pad transparently, both layouts, fwd + synthesis."""
    init_mesh(**cfg)
    nlat, nlon, lmax = 24, 48, 20
    mmax = lmax
    B, C = 2, 7  # 7 % 4 != 0, 7 % 2 != 0

    sht = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")
    dsht = DistributedRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")
    disht = DistributedInverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")

    rng = np.random.RandomState(3)
    x = rng.randn(B, C, nlat, nlon).astype(np.float32)

    ref = np.asarray(sht(x))
    out = np.asarray(dsht(jnp.asarray(x)))
    np.testing.assert_allclose(out[..., :lmax, :mmax], ref, atol=1e-4)

    # channels-last analysis
    xcl = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    out_cl = np.asarray(dsht.analysis_cl(xcl))  # (B, L, M, C, 2)
    np.testing.assert_allclose(
        out_cl[..., :lmax, :mmax, :, 0].transpose(0, 3, 1, 2), ref.real, atol=1e-4
    )

    # synthesis round trip
    c2 = dsht.analysis(jnp.asarray(x))
    back = np.asarray(disht.synthesis(c2))
    ref_back = np.asarray(InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss").synthesis(
        np.asarray(RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss").analysis(x))
    ))
    np.testing.assert_allclose(back[..., :nlat, :], ref_back, atol=1e-4)
