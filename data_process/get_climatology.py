"""Compute a day-of-year/hour-of-day climatology (ref makani
data_process/generate_wb2_climatology.py + get_hydrostatic_balance_climatology
intent): mean field per (day-of-year window, hour) over the training years,
written as HDF5.

Usage: python -m data_process.get_climatology --input_dir /train --output /stats/climatology.h5
"""

from __future__ import annotations

import argparse
import glob
import os

import h5py
import numpy as np


def compute_climatology(input_dir: str, output_path: str, h5_path: str = "fields", window_days: int = 7, dhours: int = 6):
    files = sorted(glob.glob(os.path.join(input_dir, "*.h5")))
    if not files:
        raise IOError(f"no h5 files in {input_dir}")

    with h5py.File(files[0], "r") as f:
        _, C, H, W = f[h5_path].shape

    steps_per_day = 24 // dhours
    n_bins = 366 // window_days + 1
    sums = np.zeros((n_bins, steps_per_day, C, H, W), np.float64)
    counts = np.zeros((n_bins, steps_per_day), np.int64)

    for path in files:
        with h5py.File(path, "r") as f:
            ds = f[h5_path]
            N = ds.shape[0]
            for i in range(N):
                day = (i // steps_per_day) % 366
                hour_bin = i % steps_per_day
                b = day // window_days
                sums[b, hour_bin] += np.asarray(ds[i], np.float64)
                counts[b, hour_bin] += 1

    clim = sums / np.maximum(counts[:, :, None, None, None], 1)
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with h5py.File(output_path, "w") as f:
        f.create_dataset("climatology", data=clim.astype(np.float32))
        f.attrs["window_days"] = window_days
        f.attrs["dhours"] = dhours
    return clim


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--h5_path", default="fields")
    parser.add_argument("--window_days", type=int, default=7)
    parser.add_argument("--dhours", type=int, default=6)
    args = parser.parse_args()
    compute_climatology(args.input_dir, args.output, args.h5_path, args.window_days, args.dhours)


if __name__ == "__main__":
    main()
