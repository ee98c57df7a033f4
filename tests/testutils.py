"""Shared test fixtures (ref makani tests/testutils.py:33-300).

Synthetic yearly HDF5 datasets with timestamps, stats files, and data.json
metadata — the harness every dataloader/trainer/inference test builds on.
"""

from __future__ import annotations

import json
import os

import h5py
import numpy as np

CHANNEL_NAMES = ["u10m", "v10m", "t2m", "z500", "q700"]


def get_default_parameters(tmp_path, **overrides):
    from makani_tpu.utils.yparams import ParamsBase

    base = dict(
        nettype="SFNO",
        img_shape_x=16,
        img_shape_y=32,
        scale_factor=2,
        embed_dim=16,
        num_layers=2,
        channel_names=list(CHANNEL_NAMES),
        in_channels=list(range(len(CHANNEL_NAMES))),
        out_channels=list(range(len(CHANNEL_NAMES))),
        n_history=0,
        n_future=0,
        dt=1,
        dhours=6,
        add_zenith=True,
        batch_size=8,
        valid_autoreg_steps=1,
        losses=[{"type": "l2", "channel_weights": "auto", "parameters": {"squared": True}}],
        lr=1e-3,
        max_epochs=1,
        scheduler="none",
        optimizer_type="Adam",
        normalization_layer="instance_norm_s2",
        save_checkpoint="none",
        exp_dir=str(tmp_path),
    )
    base.update(overrides)
    return ParamsBase(base)


def init_hdf5_dataset(root, years=(2017, 2018), samples_per_year=24, nlat=16, nlon=32, channels=CHANNEL_NAMES, seed=0):
    """Create synthetic yearly HDF5 files + stats + data.json; returns paths."""
    root = str(root)
    train_dir = os.path.join(root, "train")
    stats_dir = os.path.join(root, "stats")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(stats_dir, exist_ok=True)

    rng = np.random.RandomState(seed)
    C = len(channels)
    for year in years:
        path = os.path.join(train_dir, f"{year}.h5")
        data = rng.randn(samples_per_year, C, nlat, nlon).astype(np.float32) * 2.0 + 1.0
        t0 = np.datetime64(f"{year}-01-01T00:00:00").astype("datetime64[s]").astype(np.int64)
        ts = t0 + np.arange(samples_per_year) * 6 * 3600
        with h5py.File(path, "w") as f:
            f.create_dataset("fields", data=data)
            f.create_dataset("timestamp", data=ts)

    np.save(os.path.join(stats_dir, "global_means.npy"), np.ones((1, C, 1, 1)) * 1.0)
    np.save(os.path.join(stats_dir, "global_stds.npy"), np.ones((1, C, 1, 1)) * 2.0)
    np.save(os.path.join(stats_dir, "mins.npy"), np.full((1, C, 1, 1), -8.0))
    np.save(os.path.join(stats_dir, "maxs.npy"), np.full((1, C, 1, 1), 8.0))
    np.save(os.path.join(stats_dir, "time_means.npy"), np.ones((1, C, nlat, nlon)))
    np.save(os.path.join(stats_dir, "time_diff_stds.npy"), np.ones((1, C, 1, 1)) * 0.5)

    metadata = {
        "h5_path": "fields",
        "dhours": 6,
        "coords": {
            "grid_type": "equiangular",
            "lat": np.linspace(90.0, -90.0, nlat).tolist(),
            "lon": np.linspace(0.0, 360.0, nlon, endpoint=False).tolist(),
            "channel": list(channels),
        },
    }
    meta_path = os.path.join(root, "data.json")
    with open(meta_path, "w") as f:
        json.dump(metadata, f)

    return dict(
        train_data_path=train_dir,
        valid_data_path=train_dir,
        metadata_json_path=meta_path,
        global_means_path=os.path.join(stats_dir, "global_means.npy"),
        global_stds_path=os.path.join(stats_dir, "global_stds.npy"),
        min_path=os.path.join(stats_dir, "mins.npy"),
        max_path=os.path.join(stats_dir, "maxs.npy"),
        time_means_path=os.path.join(stats_dir, "time_means.npy"),
        time_diff_stds_path=os.path.join(stats_dir, "time_diff_stds.npy"),
    )
