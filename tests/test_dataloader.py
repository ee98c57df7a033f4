"""Dataloader and dataset-metadata tests (ref makani tests/test_dataloader.py,
test_parse_dataset_metadata.py)."""

import numpy as np
import pytest

from tests.testutils import get_default_parameters, init_hdf5_dataset


def test_multifiles_dataset(tmp_path):
    from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset

    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(tmp_path, **paths)

    ds = MultifilesDataset(params, paths["train_data_path"], train=True)
    assert len(ds) > 0
    s = ds[0]
    assert s["inp"].shape == (1, 5, 16, 32)
    assert s["tar"].shape == (1, 5, 16, 32)
    assert "izen" in s and s["izen"].shape == (1, 1, 16, 32)
    # zenith is a cosine
    assert np.abs(s["izen"]).max() <= 1.0 + 1e-6

    # normalization applied: mean 1, std 2 raw -> roughly standard normal
    assert abs(float(s["inp"].mean())) < 0.5
    assert abs(float(s["inp"].std()) - 1.0) < 0.3


def test_multifiles_respects_dt_and_windows(tmp_path):
    from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset

    paths = init_hdf5_dataset(tmp_path, samples_per_year=30)
    params = get_default_parameters(tmp_path, n_history=1, n_future=1, dt=2, **paths)
    ds = MultifilesDataset(params, paths["train_data_path"], train=True)
    s = ds[0]
    assert s["inp"].shape[0] == 2  # n_history + 1
    assert s["tar"].shape[0] == 2  # n_future + 1


def test_batch_iterator(tmp_path):
    from makani_tpu.utils.dataloader import get_dataloader

    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(tmp_path, batch_size=4, **paths)
    it, ds = get_dataloader(params, paths["train_data_path"], mode="train")
    batch = next(iter(it))
    assert batch["inp"].shape == (4, 5, 16, 32)
    assert batch["tar"].shape == (4, 5, 16, 32)
    assert batch["zen"].shape == (4, 1, 1, 16, 32)


def test_parse_dataset_metadata(tmp_path):
    from makani_tpu.utils.parse_dataset_metadata import parse_dataset_metadata
    from tests.testutils import CHANNEL_NAMES

    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(tmp_path, **paths)
    params, meta = parse_dataset_metadata(paths["metadata_json_path"], params)
    assert params["img_shape_x"] == 16
    assert params["img_shape_y"] == 32
    assert params["in_channels"] == list(range(len(CHANNEL_NAMES)))
    assert params["dhours"] == 6


def test_get_sample_at_time(tmp_path):
    from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset

    paths = init_hdf5_dataset(tmp_path, years=(2017,), samples_per_year=24)
    params = get_default_parameters(tmp_path, **paths)
    ds = MultifilesDataset(params, paths["train_data_path"], train=False)
    idx = ds.get_sample_at_time(np.datetime64("2017-01-02T00:00:00"))
    assert 0 <= idx < len(ds)


def test_multifiles_crop_and_subsample(tmp_path):
    """crop_size/crop_anchor/subsampling_factor (ref data_loader_multifiles.py:69-71)."""
    from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset
    from makani_tpu.utils.yparams import ParamsBase
    from tests.testutils import init_hdf5_dataset

    paths = init_hdf5_dataset(tmp_path)
    params = ParamsBase(
        dict(
            n_history=0,
            n_future=0,
            dt=1,
            dhours=6,
            in_channels=[0, 1],
            out_channels=[0, 1],
            channel_names=["u10m", "v10m"],
            crop_size_x=12,
            crop_size_y=20,
            crop_anchor_x=2,
            crop_anchor_y=4,
            subsampling_factor=2,
            **paths,
        )
    )
    ds = MultifilesDataset(params, paths["train_data_path"], train=True)
    assert params["img_shape_x"] == 6 and params["img_shape_y"] == 10
    s = ds[0]
    assert s["inp"].shape == (1, 2, 6, 10)
    assert s["tar"].shape == (1, 2, 6, 10)
    # cropped read equals slicing the full read
    params_full = ParamsBase(
        dict(
            n_history=0, n_future=0, dt=1, dhours=6, in_channels=[0, 1], out_channels=[0, 1],
            channel_names=["u10m", "v10m"], **paths,
        )
    )
    ds_full = MultifilesDataset(params_full, paths["train_data_path"], train=True)
    f = ds_full[0]
    np.testing.assert_allclose(s["inp"], f["inp"][:, :, 2:14:2, 4:24:2])


def test_grain_loader_matches_dataset(tmp_path):
    """GrainDataLoader (the DALI-pipeline counterpart) must assemble the same
    batches the dataset yields: shapes, flattened history channels, zenith
    concatenation; shuffles reproducibly per epoch."""
    grain = pytest.importorskip("grain")
    from makani_tpu.utils.dataloaders.data_loader_grain import GrainDataLoader
    from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset

    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(tmp_path, **paths)
    ds = MultifilesDataset(params, paths["train_data_path"], train=True)

    loader = GrainDataLoader(ds, batch_size=2, shuffle=False, num_workers=0, prefetch=1)
    assert len(loader) == len(ds) // 2
    batches = list(iter(loader))
    assert len(batches) == len(loader)
    b0 = batches[0]
    assert b0["inp"].shape == (2, 5, 16, 32)
    assert b0["tar"].shape == (2, 5, 16, 32)
    assert "zen" in b0
    # unshuffled: first batch is samples 0 and 1, channels flattened over time
    s0, s1 = ds[0], ds[1]
    np.testing.assert_allclose(b0["inp"][0], s0["inp"].reshape(-1, 16, 32), atol=1e-6)
    np.testing.assert_allclose(b0["inp"][1], s1["inp"].reshape(-1, 16, 32), atol=1e-6)


def test_grain_loader_shuffle_reproducible_and_reshuffles(tmp_path):
    pytest.importorskip("grain")
    from makani_tpu.utils.dataloaders.data_loader_grain import GrainDataLoader
    from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset

    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(tmp_path, **paths)
    ds = MultifilesDataset(params, paths["train_data_path"], train=True)

    la = GrainDataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=0)
    lb = GrainDataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=0)
    ea = np.stack([b["inp"] for b in iter(la)])
    eb = np.stack([b["inp"] for b in iter(lb)])
    np.testing.assert_allclose(ea, eb)  # same seed + epoch -> same order
    ea2 = np.stack([b["inp"] for b in iter(la)])  # epoch advanced
    assert not np.allclose(ea, ea2)  # reshuffled between epochs


def test_reordered_out_channels_normalization(tmp_path):
    """Targets read via a reordered/subset out_channels must be normalized
    with stats in out row order, not in_channels row order (advisor r3)."""
    import os

    from makani_tpu.utils.dataloaders.data_helpers import get_out_normalization, out_channel_names
    from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset

    paths = init_hdf5_dataset(tmp_path)
    # distinct per-channel stats so a row mixup is visible
    C = 5
    means = np.arange(C, dtype=np.float64).reshape(1, C, 1, 1) * 10.0
    stds = (np.arange(C, dtype=np.float64).reshape(1, C, 1, 1) + 1.0) * 2.0
    np.save(os.path.join(str(tmp_path), "stats", "global_means.npy"), means)
    np.save(os.path.join(str(tmp_path), "stats", "global_stds.npy"), stds)

    out_ch = [3, 1, 4]
    params = get_default_parameters(tmp_path, out_channels=out_ch, **paths)
    ds = MultifilesDataset(params, paths["train_data_path"], train=True)
    s = ds[0]
    assert s["tar"].shape[1] == 3

    # raw (unnormalized) read for comparison
    params_raw = get_default_parameters(
        tmp_path, out_channels=out_ch,
        **{**paths, "global_means_path": None, "global_stds_path": None},
    )
    raw = MultifilesDataset(params_raw, paths["train_data_path"], train=True)[0]
    expect = (raw["tar"] - means[0, out_ch][None]) / stds[0, out_ch][None]
    np.testing.assert_allclose(s["tar"], expect, rtol=1e-5, atol=1e-5)
    # inputs still in in order
    expect_in = (raw["inp"] - means[0][None]) / stds[0][None]
    np.testing.assert_allclose(s["inp"], expect_in, rtol=1e-5, atol=1e-5)

    # helper sanity
    names = out_channel_names(params)
    assert names == ["z500", "v10m", "q700"]
    b, sc = get_out_normalization(params)
    np.testing.assert_allclose(b[0, :, 0, 0], means[0, out_ch, 0, 0])
    np.testing.assert_allclose(sc[0, :, 0, 0], stds[0, out_ch, 0, 0])
