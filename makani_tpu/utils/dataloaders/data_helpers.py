"""Normalization statistics and climatology loaders
(ref makani/utils/dataloaders/data_helpers.py:25-200).

All stats are ``.npy`` files of shape (1, C_data, 1, 1) over the dataset's
full channel set; loaders select the configured channel subset and honor the
per-channel normalization-mode dict ("zscore" default, "minmax" per name,
"none").
"""

from __future__ import annotations

import os

import numpy as np

__all__ = [
    "get_data_normalization",
    "get_out_normalization",
    "out_channel_names",
    "get_time_diff_stds",
    "get_time_means",
    "get_climatology",
]


def _load(path):
    if path is None or not os.path.isfile(path):
        return None
    return np.load(path)


def get_data_normalization(params):
    """Return (bias, scale) arrays of shape (1, C_sel, 1, 1) such that
    normalized = (x - bias) / scale."""
    channel_names = params.get("channel_names")
    in_channels = np.asarray(params.get("in_channels", range(len(channel_names))))

    normalization = params.get("normalization", {}) or {}
    if isinstance(normalization, str):
        normalization = {ch: normalization for ch in channel_names}

    mins = _load(params.get("min_path"))
    maxs = _load(params.get("max_path"))
    means = _load(params.get("global_means_path"))
    stds = _load(params.get("global_stds_path"))

    n = len(in_channels)
    bias = np.zeros((1, n, 1, 1), dtype=np.float64)
    scale = np.ones((1, n, 1, 1), dtype=np.float64)

    for i, (c, name) in enumerate(zip(in_channels, channel_names)):
        mode = normalization.get(name, "zscore")
        if mode == "minmax":
            if mins is None or maxs is None:
                raise ValueError(f"minmax normalization for {name} requires min/max stats files")
            bias[0, i] = mins[0, c]
            scale[0, i] = maxs[0, c] - mins[0, c]
        elif mode == "zscore":
            if means is None or stds is None:
                # tolerate missing stats (synthetic data): identity normalization
                continue
            bias[0, i] = means[0, c]
            scale[0, i] = stds[0, c]
        elif mode == "none":
            continue
        else:
            raise ValueError(f"Unknown normalization mode {mode} for channel {name}")

    return bias.astype(np.float32), scale.astype(np.float32)


def out_channel_names(params):
    """Names of the out_channels selection.

    ``channel_names`` pairs positionally with ``in_channels`` (both select
    from the dataset's channel set); out_channels may reorder or subset it.
    Dataset channels absent from in_channels get a synthetic ``ch<i>`` name.
    """
    names = params.get("channel_names")
    if names is None:
        return None
    in_ch = list(params.get("in_channels", range(len(names))))
    out_ch = list(params.get("out_channels", in_ch))
    pos = {int(c): i for i, c in enumerate(in_ch)}
    return [names[pos[int(c)]] if int(c) in pos else f"ch{int(c)}" for c in out_ch]


def get_out_normalization(params):
    """(bias, scale) rows in *out_channels* order, shape (1, C_out, 1, 1).

    get_data_normalization returns rows in in_channels order; targets,
    climatology, and model outputs are in out_channels order (which may be a
    reordering), so they must be normalized with these stats instead (ref
    data_helpers.py selects in/out rows separately).
    """
    out_ch = params.get("out_channels")
    if out_ch is None or np.array_equal(
        np.asarray(params.get("in_channels", out_ch)), np.asarray(out_ch)
    ):
        return get_data_normalization(params)
    view = dict(params) if isinstance(params, dict) else dict(params.to_dict())
    view["in_channels"] = out_ch
    names = out_channel_names(params)
    if names is not None:
        view["channel_names"] = names
    return get_data_normalization(view)


def get_time_diff_stds(params):
    """Per-channel std of the time difference x(t+dt) - x(t), over the full
    dataset channel set; identity if the stats file is absent."""
    stds = _load(params.get("time_diff_stds_path"))
    if stds is None:
        nch = len(params.get("data_channel_names", params.get("channel_names")))
        return np.ones((1, nch, 1, 1), dtype=np.float32)
    dt = params.get("dt", 1)
    if stds.ndim == 5:
        # files may store stds for multiple dt strides in dim 0
        stds = stds[min(dt, stds.shape[0]) - 1]
    return stds.astype(np.float32)


def get_time_means(params):
    return _load(params.get("time_means_path"))


def get_climatology(params):
    """Time-mean climatology over the selected output channels, normalized the
    same way as targets (used by the ACC metric)."""
    tm = get_time_means(params)
    if tm is None:
        return None
    out_channels = np.asarray(params.get("out_channels"))
    clim = tm[0, out_channels]
    # bias/scale rows follow in_channels order — pick the row matching each
    # output channel (out_channels may be a subset/reordering of in_channels)
    bias, scale = get_data_normalization(params)
    in_channels = np.asarray(params.get("in_channels", range(len(params.get("channel_names")))))
    rows = np.asarray([int(np.where(in_channels == c)[0][0]) for c in out_channels])
    clim = (clim - bias[0, rows]) / scale[0, rows]
    return clim.astype(np.float32)
