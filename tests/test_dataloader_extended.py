"""Dataloader content-correctness breadth tests: exact window indexing across
file boundaries, margin accounting, io-tile reads composed with crop and
subsampling, timestamp APIs, and separate in/out normalization stats
(ref makani tests/test_dataloader.py — the window/content assertions around
data_loader_multifiles.py:386-419).

The synthetic files here encode the (time, channel, lat, lon) index into the
value so every read can be checked for exact placement, not just shape.
"""

import json
import os

import h5py
import numpy as np
import pytest

from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset
from makani_tpu.utils.yparams import ParamsBase

NLAT, NLON, C = 12, 24, 3


def _value(t, c, i, j):
    # unique, exactly representable in fp32
    return t * 100000.0 + c * 10000.0 + i * 100.0 + j


def make_indexed_dataset(root, years=(2000, 2001), n=10, identity_stats=True):
    root = str(root)
    train = os.path.join(root, "train")
    stats = os.path.join(root, "stats")
    os.makedirs(train, exist_ok=True)
    os.makedirs(stats, exist_ok=True)
    tt, cc, ii, jj = np.meshgrid(np.arange(n), np.arange(C), np.arange(NLAT), np.arange(NLON), indexing="ij")
    for year in years:
        data = _value(tt, cc, ii, jj).astype(np.float32)
        t0 = np.datetime64(f"{year}-01-01T00:00:00").astype("datetime64[s]").astype(np.int64)
        with h5py.File(os.path.join(train, f"{year}.h5"), "w") as f:
            f.create_dataset("fields", data=data)
            f.create_dataset("timestamp", data=t0 + np.arange(n) * 6 * 3600)
    scale = 1.0 if identity_stats else 2.0
    np.save(os.path.join(stats, "global_means.npy"), np.zeros((1, C, 1, 1)))
    np.save(os.path.join(stats, "global_stds.npy"), np.full((1, C, 1, 1), scale))
    return train, stats


def make_params(stats_dir, **kw):
    base = dict(
        channel_names=["a", "b", "c"],
        in_channels=list(range(C)),
        out_channels=list(range(C)),
        n_history=0,
        n_future=0,
        dt=1,
        dhours=6,
        add_zenith=False,
        global_means_path=os.path.join(stats_dir, "global_means.npy"),
        global_stds_path=os.path.join(stats_dir, "global_stds.npy"),
        normalization="zscore",
    )
    base.update(kw)
    return ParamsBase(base)


def test_exact_window_content_and_margins(tmp_path):
    """inp reads steps [idx .. idx+n_history], tar the following n_future+1
    steps, offset by the front margin."""
    train, stats = make_indexed_dataset(tmp_path, years=(2000,), n=10)
    params = make_params(stats, n_history=1, n_future=2, dt=1)
    ds = MultifilesDataset(params, train, train=True)
    # margins: 1 front, 3 back -> 10 - 4 = 6 valid samples
    assert len(ds) == 6
    s = ds[0]
    assert s["inp"].shape == (2, C, NLAT, NLON)
    assert s["tar"].shape == (3, C, NLAT, NLON)
    # sample 0's base time index is margin_front = 1
    for t_rel, t_abs in enumerate([0, 1]):
        np.testing.assert_array_equal(s["inp"][t_rel, 1], _value(t_abs, 1, *np.meshgrid(np.arange(NLAT), np.arange(NLON), indexing="ij")))
    for t_rel, t_abs in enumerate([2, 3, 4]):
        assert s["tar"][t_rel, 0, 0, 0] == _value(t_abs, 0, 0, 0)


def test_dt_strided_windows(tmp_path):
    train, stats = make_indexed_dataset(tmp_path, years=(2000,), n=12)
    params = make_params(stats, n_history=1, n_future=1, dt=3)
    ds = MultifilesDataset(params, train, train=True)
    # margins: 3 front, 6 back -> 3 valid
    assert len(ds) == 3
    s = ds[1]  # base index 3 + 1 = 4
    assert s["inp"][0, 0, 0, 0] == _value(1, 0, 0, 0)  # base - dt
    assert s["inp"][1, 0, 0, 0] == _value(4, 0, 0, 0)  # base
    assert s["tar"][0, 0, 0, 0] == _value(7, 0, 0, 0)  # base + dt
    assert s["tar"][1, 0, 0, 0] == _value(10, 0, 0, 0)  # base + 2 dt


def test_file_boundary_indexing(tmp_path):
    """Sample indices never straddle files: the last valid sample of file 0 is
    followed by the first valid sample of file 1."""
    train, stats = make_indexed_dataset(tmp_path, years=(2000, 2001), n=6)
    params = make_params(stats, n_history=0, n_future=1, dt=1)
    ds = MultifilesDataset(params, train, train=True)
    per_file = 6 - 2  # margin_back = 2
    assert len(ds) == 2 * per_file
    t2000 = ds.base_timestamp(per_file - 1)
    t2001 = ds.base_timestamp(per_file)
    assert np.datetime64(int(t2000), "s").astype("datetime64[Y]") == np.datetime64("2000")
    assert np.datetime64(int(t2001), "s").astype("datetime64[Y]") == np.datetime64("2001")
    # first sample of the second file reads that file's own step 0
    s = ds[per_file]
    assert s["inp"][0, 0, 0, 0] == _value(0, 0, 0, 0)


def test_target_timestamps_lead_times(tmp_path):
    train, stats = make_indexed_dataset(tmp_path, years=(2000,), n=8)
    params = make_params(stats, n_future=2)
    ds = MultifilesDataset(params, train, train=True)
    base = ds.base_timestamp(0)
    tts = ds.target_timestamps(0)
    assert [t - base for t in tts] == [6 * 3600, 12 * 3600, 18 * 3600]


def test_io_tile_restricts_rows_and_cols(tmp_path):
    """io_tile reads only the tile's rows/cols of the global grid — the
    sharded-IO path (ref dataloader.py:30-71 io_grid)."""
    train, stats = make_indexed_dataset(tmp_path, years=(2000,), n=5)
    params = make_params(stats, io_tile_x=(3, 9), io_tile_y=(10, 20))
    ds = MultifilesDataset(params, train, train=True)
    s = ds[0]
    assert s["inp"].shape == (1, C, 6, 10)
    ii, jj = np.meshgrid(np.arange(3, 9), np.arange(10, 20), indexing="ij")
    np.testing.assert_array_equal(s["inp"][0, 2], _value(0, 2, ii, jj))


def test_crop_subsample_tile_composition(tmp_path):
    """Crop anchor, stride subsampling and the io tile compose: tile indices
    address the cropped+subsampled grid."""
    train, stats = make_indexed_dataset(tmp_path, years=(2000,), n=5)
    params = make_params(
        stats,
        crop_anchor_x=2,
        crop_anchor_y=4,
        crop_size_x=8,
        crop_size_y=16,
        subsampling_factor=2,
    )
    ds = MultifilesDataset(params, train, train=True)
    assert ds.img_shape == (4, 8)
    s = ds[0]
    ii, jj = np.meshgrid(2 + 2 * np.arange(4), 4 + 2 * np.arange(8), indexing="ij")
    np.testing.assert_array_equal(s["inp"][0, 0], _value(0, 0, ii, jj))

    # a tile into that subsampled grid selects file rows anchor + 2*tile
    params2 = make_params(
        stats,
        crop_anchor_x=2,
        crop_anchor_y=4,
        crop_size_x=8,
        crop_size_y=16,
        subsampling_factor=2,
        io_tile_x=(1, 3),
        io_tile_y=(2, 6),
    )
    ds2 = MultifilesDataset(params2, train, train=True)
    s2 = ds2[0]
    assert s2["inp"].shape == (1, C, 2, 4)
    ii, jj = np.meshgrid(2 + 2 * np.array([1, 2]), 4 + 2 * np.array([2, 3, 4, 5]), indexing="ij")
    np.testing.assert_array_equal(s2["inp"][0, 1], _value(0, 1, ii, jj))


def test_separate_in_out_channel_stats(tmp_path):
    """Targets normalize with out_channels' stats rows even when out_channels
    reorders/subsets in_channels."""
    train, stats = make_indexed_dataset(tmp_path, years=(2000,), n=5, identity_stats=True)
    # distinct per-channel stats
    np.save(os.path.join(stats, "global_means.npy"), np.arange(C, dtype=np.float64).reshape(1, C, 1, 1))
    np.save(os.path.join(stats, "global_stds.npy"), (np.arange(C, dtype=np.float64) + 1.0).reshape(1, C, 1, 1))
    params = make_params(stats, in_channels=[0, 1, 2], out_channels=[2, 0])
    ds = MultifilesDataset(params, train, train=True)
    s = ds[0]
    raw = _value(1, 2, 0, 0)  # tar step 0, channel "c"
    np.testing.assert_allclose(s["tar"][0, 0, 0, 0], (raw - 2.0) / 3.0, rtol=1e-6)
    raw0 = _value(1, 0, 0, 0)
    np.testing.assert_allclose(s["tar"][0, 1, 0, 0], (raw0 - 0.0) / 1.0, rtol=1e-6)


def test_zenith_follows_sample_timestamp(tmp_path):
    """The zenith channel equals the ephemeris evaluated at the sample's own
    timestamps on the dataset grid."""
    from makani_tpu.utils.zenith_angle import cos_zenith_angle_from_timestamp

    train, stats = make_indexed_dataset(tmp_path, years=(2000,), n=5)
    params = make_params(stats, add_zenith=True, n_future=1)
    ds = MultifilesDataset(params, train, train=True)
    s = ds[1]
    base = ds.base_timestamp(1)
    lon, lat = np.meshgrid(ds.lon_deg, ds.lat_deg)
    np.testing.assert_allclose(s["izen"][0, 0], cos_zenith_angle_from_timestamp(float(base), lon, lat), rtol=1e-6)
    tts = ds.target_timestamps(1)
    np.testing.assert_allclose(s["tzen"][1, 0], cos_zenith_angle_from_timestamp(float(tts[1]), lon, lat), rtol=1e-6)


def test_get_sample_at_time_and_missing(tmp_path):
    train, stats = make_indexed_dataset(tmp_path, years=(2000, 2001), n=6)
    params = make_params(stats, n_future=1)
    ds = MultifilesDataset(params, train, train=True)
    idx = ds.get_sample_at_time(np.datetime64("2001-01-01T06:00:00"))
    assert np.datetime64(int(ds.base_timestamp(idx)), "s") == np.datetime64("2001-01-01T06:00:00")
    with pytest.raises(ValueError):
        ds.get_sample_at_time(np.datetime64("1999-01-01T00:00:00"))


def test_empty_location_raises(tmp_path):
    os.makedirs(tmp_path / "empty", exist_ok=True)
    _, stats = make_indexed_dataset(tmp_path, years=(2000,), n=5)
    with pytest.raises(IOError):
        MultifilesDataset(make_params(stats), str(tmp_path / "empty"), train=True)


def test_crop_exceeding_file_shape_raises(tmp_path):
    train, stats = make_indexed_dataset(tmp_path, years=(2000,), n=5)
    with pytest.raises(ValueError):
        MultifilesDataset(make_params(stats, crop_anchor_x=8, crop_size_x=8), train, train=True)
