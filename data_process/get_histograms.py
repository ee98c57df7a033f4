"""Per-channel value histograms of a dataset (ref makani
data_process/get_histograms.py).

Usage: python -m data_process.get_histograms --input_dir /train --output /stats/histograms.h5
"""

from __future__ import annotations

import argparse
import glob
import os

import h5py
import numpy as np


def compute_histograms(input_dir: str, output_path: str, h5_path: str = "fields", bins: int = 128, chunk: int = 8):
    files = sorted(glob.glob(os.path.join(input_dir, "*.h5")))
    if not files:
        raise IOError(f"no h5 files in {input_dir}")

    with h5py.File(files[0], "r") as f:
        _, C, H, W = f[h5_path].shape

    # pass 1: ranges
    mins = np.full(C, np.inf)
    maxs = np.full(C, -np.inf)
    for path in files:
        with h5py.File(path, "r") as f:
            ds = f[h5_path]
            for i0 in range(0, ds.shape[0], chunk):
                block = np.asarray(ds[i0 : i0 + chunk])
                mins = np.minimum(mins, block.min(axis=(0, 2, 3)))
                maxs = np.maximum(maxs, block.max(axis=(0, 2, 3)))

    edges = np.stack([np.linspace(mins[c], maxs[c] + 1e-12, bins + 1) for c in range(C)])
    counts = np.zeros((C, bins), np.int64)

    # pass 2: histogram
    for path in files:
        with h5py.File(path, "r") as f:
            ds = f[h5_path]
            for i0 in range(0, ds.shape[0], chunk):
                block = np.asarray(ds[i0 : i0 + chunk])
                for c in range(C):
                    h, _ = np.histogram(block[:, c].ravel(), bins=edges[c])
                    counts[c] += h

    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with h5py.File(output_path, "w") as f:
        f.create_dataset("counts", data=counts)
        f.create_dataset("edges", data=edges)
    return counts, edges


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--h5_path", default="fields")
    parser.add_argument("--bins", type=int, default=128)
    args = parser.parse_args()
    compute_histograms(args.input_dir, args.output, args.h5_path, args.bins)


if __name__ == "__main__":
    main()
