"""Native C++ pread reader (makani_tpu/native): correctness vs numpy, the
loader's native full-slab and tile paths vs the memmap path, error handling.
Skipped when no C++ toolchain is available (the .so builds lazily).
Counterpart of the reference's DALI reader layer (dali_es_helper_2d.py)."""

import os

import numpy as np
import pytest

from makani_tpu import native

if native.get_reader() is None:
    pytest.skip("no native toolchain", allow_module_level=True)


def test_read_blocks_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal(4096).astype(np.float32)
    p = str(tmp_path / "blob.bin")
    data.tofile(p)

    # three blocks, out of order, interleaved destinations
    offsets = np.asarray([1024 * 4, 0, 2048 * 4], np.uint64)
    sizes = np.asarray([512 * 4, 256 * 4, 1024 * 4], np.uint64)
    dest = np.asarray([0, 512 * 4, (512 + 256) * 4], np.uint64)
    out = np.empty(512 + 256 + 1024, np.float32)
    native.read_blocks(p, offsets, sizes, out, dest, nthreads=3)

    np.testing.assert_array_equal(out[:512], data[1024:1536])
    np.testing.assert_array_equal(out[512:768], data[:256])
    np.testing.assert_array_equal(out[768:], data[2048:3072])


def test_read_blocks_missing_file_raises(tmp_path):
    with pytest.raises((OSError, RuntimeError)):
        native.read_blocks(
            str(tmp_path / "nope.bin"),
            np.zeros(1, np.uint64),
            np.ones(1, np.uint64) * 4,
            np.empty(1, np.float32),
            np.zeros(1, np.uint64),
        )


def test_read_blocks_short_file_raises(tmp_path):
    p = str(tmp_path / "short.bin")
    np.zeros(4, np.float32).tofile(p)
    with pytest.raises(OSError):
        native.read_blocks(
            p,
            np.zeros(1, np.uint64),
            np.asarray([1024], np.uint64),  # beyond EOF
            np.empty(256, np.float32),
            np.zeros(1, np.uint64),
        )


@pytest.fixture()
def h5_dataset(tmp_path):
    import h5py

    from makani_tpu.utils.yparams import ParamsBase

    rng = np.random.default_rng(1)
    T, C, H, W = 6, 3, 16, 32
    arr = rng.standard_normal((T, C, H, W)).astype(np.float32)
    d = tmp_path / "train"
    d.mkdir()
    with h5py.File(str(d / "2001.h5"), "w") as f:
        f.create_dataset("fields", data=arr)  # contiguous fp32
    params = ParamsBase(
        dict(
            channel_names=[f"c{i}" for i in range(C)],
            in_channels=list(range(C)),
            out_channels=list(range(C)),
            img_shape_x=H,
            img_shape_y=W,
            dt=1,
            n_history=0,
            n_future=0,
            dhours=6,
            add_zenith=False,
            normalization="none",
        )
    )
    return params, str(d), arr


def _dataset(params, loc):
    from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset

    return MultifilesDataset(params, loc, train=True)


def test_loader_native_matches_memmap_full(h5_dataset, monkeypatch):
    params, loc, arr = h5_dataset
    ds0 = _dataset(params, loc)
    ref = ds0[1]
    monkeypatch.setenv("MAKANI_NATIVE_READER", "1")
    ds1 = _dataset(params, loc)
    got = ds1[1]
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loader_native_matches_memmap_tile(h5_dataset, monkeypatch):
    params, loc, arr = h5_dataset
    params["io_tile_x"] = (4, 12)  # row window of the 16-lat grid
    params["io_tile_y"] = (8, 24)  # col window of the 32-lon grid
    ds0 = _dataset(params, loc)
    ref = ds0[2]
    monkeypatch.setenv("MAKANI_NATIVE_READER", "1")
    ds1 = _dataset(params, loc)
    got = ds1[2]
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
