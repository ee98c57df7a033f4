"""Normalization-stat loaders (ref tests/test_data_helpers.py): per-channel
zscore/minmax/none modes, channel-subset selection, dt-strided time-diff
stats, climatology normalization consistency."""

import numpy as np
import pytest

from makani_tpu.utils.dataloaders.data_helpers import (
    get_climatology,
    get_data_normalization,
    get_time_diff_stds,
)
from makani_tpu.utils.yparams import ParamsBase

NAMES = ["t2m", "u10m", "tcwv"]


@pytest.fixture()
def stats_dir(tmp_path):
    rng = np.random.default_rng(0)
    means = rng.standard_normal((1, 3, 1, 1))
    stds = np.abs(rng.standard_normal((1, 3, 1, 1))) + 0.5
    mins = -np.abs(rng.standard_normal((1, 3, 1, 1))) - 1.0
    maxs = np.abs(rng.standard_normal((1, 3, 1, 1))) + 1.0
    tm = rng.standard_normal((1, 3, 8, 16)).astype(np.float32)
    paths = {}
    for name, arr in [("means", means), ("stds", stds), ("mins", mins), ("maxs", maxs), ("time_means", tm)]:
        p = str(tmp_path / f"{name}.npy")
        np.save(p, arr)
        paths[name] = p
    return paths, means, stds, mins, maxs, tm


def _params(paths, **kw):
    base = dict(
        channel_names=NAMES,
        in_channels=[0, 1, 2],
        out_channels=[0, 1, 2],
        global_means_path=paths["means"],
        global_stds_path=paths["stds"],
        min_path=paths["mins"],
        max_path=paths["maxs"],
        time_means_path=paths["time_means"],
    )
    base.update(kw)
    return ParamsBase(base)


def test_zscore_default(stats_dir):
    paths, means, stds, *_ = stats_dir
    bias, scale = get_data_normalization(_params(paths))
    np.testing.assert_allclose(bias, means.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(scale, stds.astype(np.float32), rtol=1e-6)


def test_per_channel_mode_dict(stats_dir):
    paths, means, stds, mins, maxs, _ = stats_dir
    p = _params(paths, normalization={"tcwv": "minmax", "u10m": "none"})
    bias, scale = get_data_normalization(p)
    np.testing.assert_allclose(bias[0, 0, 0, 0], means[0, 0, 0, 0], rtol=1e-6)  # zscore default
    assert bias[0, 1, 0, 0] == 0.0 and scale[0, 1, 0, 0] == 1.0  # none
    np.testing.assert_allclose(bias[0, 2, 0, 0], mins[0, 2, 0, 0], rtol=1e-6)  # minmax
    np.testing.assert_allclose(scale[0, 2, 0, 0], (maxs - mins)[0, 2, 0, 0], rtol=1e-6)


def test_channel_subset_selection(stats_dir):
    paths, means, stds, *_ = stats_dir
    p = _params(paths, in_channels=[2, 0], channel_names=["tcwv", "t2m"])
    bias, scale = get_data_normalization(p)
    assert bias.shape == (1, 2, 1, 1)
    np.testing.assert_allclose(bias[0, 0, 0, 0], means[0, 2, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(bias[0, 1, 0, 0], means[0, 0, 0, 0], rtol=1e-6)


def test_missing_stats_identity(tmp_path):
    p = ParamsBase(dict(channel_names=NAMES, in_channels=[0, 1, 2]))
    bias, scale = get_data_normalization(p)
    assert np.all(bias == 0.0) and np.all(scale == 1.0)


def test_unknown_mode_raises(stats_dir):
    paths, *_ = stats_dir
    with pytest.raises(ValueError):
        get_data_normalization(_params(paths, normalization={"t2m": "quantile"}))


def test_time_diff_stds_dt_stride(tmp_path):
    arr = np.abs(np.random.default_rng(1).standard_normal((3, 1, 3, 1, 1))) + 0.1
    p5 = str(tmp_path / "td.npy")
    np.save(p5, arr)
    p = ParamsBase(dict(channel_names=NAMES, time_diff_stds_path=p5, dt=2))
    out = get_time_diff_stds(p)
    np.testing.assert_allclose(out, arr[1].astype(np.float32), rtol=1e-6)
    # absent file -> identity
    p2 = ParamsBase(dict(channel_names=NAMES))
    np.testing.assert_allclose(get_time_diff_stds(p2), np.ones((1, 3, 1, 1), np.float32))


def test_climatology_normalized_like_targets(stats_dir):
    paths, means, stds, _, _, tm = stats_dir
    p = _params(paths, out_channels=[1, 2])
    clim = get_climatology(p)
    assert clim.shape == (2, 8, 16)
    # climatology selects out_channels from the time means, then applies the
    # stats rows matching those channels (bias/scale follow in_channels order)
    bias, scale = get_data_normalization(p)
    want = (tm[0, [1, 2]] - bias[0, [1, 2]]) / scale[0, [1, 2]]
    np.testing.assert_allclose(clim, want.astype(np.float32), rtol=1e-5)
