"""Compute dataset normalization statistics (ref makani
data_process/get_stats.py, 669 LoC with mpi4py; here a single-process
streaming pass — the datasets are read once chunk-wise with Welford updates,
parallelism comes from numpy vectorization over channels).

Produces the stats files the training configs reference:

    global_means.npy / global_stds.npy   (1, C, 1, 1)
    mins.npy / maxs.npy                  (1, C, 1, 1)
    time_means.npy                       (1, C, H, W)
    time_diff_means.npy / time_diff_stds.npy (1, C, 1, 1)

Usage: python -m data_process.get_stats --input_dir /train --output_dir /stats [--dt 1]
"""

from __future__ import annotations

import argparse
import glob
import os

import h5py
import numpy as np


def welford_update(count, mean, m2, batch):
    """Chan parallel-combine for a batch of samples: batch (N, C)."""
    n_b = batch.shape[0]
    mean_b = batch.mean(axis=0)
    m2_b = ((batch - mean_b) ** 2).sum(axis=0)
    delta = mean_b - mean
    tot = count + n_b
    mean = mean + delta * n_b / tot
    m2 = m2 + m2_b + delta**2 * count * n_b / tot
    return tot, mean, m2


def compute_stats(input_dir: str, output_dir: str, h5_path: str = "fields", dt: int = 1, chunk: int = 8, quadrature: str = "naive"):
    files = sorted(glob.glob(os.path.join(input_dir, "*.h5")))
    if not files:
        raise IOError(f"no h5 files in {input_dir}")
    os.makedirs(output_dir, exist_ok=True)

    with h5py.File(files[0], "r") as f:
        _, C, H, W = f[h5_path].shape

    # area weights for the spatial mean (normalized naive quadrature)
    from makani_tpu.utils.grids import quadrature_weights

    qw = quadrature_weights(quadrature, (H, W), normalize=True).astype(np.float64)

    count = 0
    mean = np.zeros(C)
    m2 = np.zeros(C)
    dcount = 0
    dmean = np.zeros(C)
    dm2 = np.zeros(C)
    mins = np.full(C, np.inf)
    maxs = np.full(C, -np.inf)
    tsum = np.zeros((C, H, W))
    tn = 0

    for path in files:
        with h5py.File(path, "r") as f:
            ds = f[h5_path]
            N = ds.shape[0]
            prev = None
            for i0 in range(0, N, chunk):
                block = np.asarray(ds[i0 : i0 + chunk], dtype=np.float64)
                # area-weighted spatial means per sample
                sm = np.tensordot(block, qw, axes=([2, 3], [0, 1]))  # (n, C)
                count, mean, m2 = welford_update(count, mean, m2, sm)
                mins = np.minimum(mins, block.min(axis=(0, 2, 3)))
                maxs = np.maximum(maxs, block.max(axis=(0, 2, 3)))
                tsum += block.sum(axis=0)
                tn += block.shape[0]
                # time differences with stride dt
                seq = block if prev is None else np.concatenate([prev, block], axis=0)
                if seq.shape[0] > dt:
                    diffs = seq[dt:] - seq[:-dt]
                    dm = np.tensordot(diffs, qw, axes=([2, 3], [0, 1]))
                    dsq = np.tensordot(diffs**2, qw, axes=([2, 3], [0, 1]))
                    dcount, dmean, dm2 = welford_update(dcount, dmean, dm2, dm)
                    # accumulate variance of the diff field directly
                    dm2 += (dsq - dm**2).sum(axis=0)
                prev = block[-dt:]

    # NOTE: global std here is the std of the full field, which needs the
    # spatial second moment; recompute via a second pass of squares
    sqsum = np.zeros(C)
    ntot = 0
    for path in files:
        with h5py.File(path, "r") as f:
            ds = f[h5_path]
            for i0 in range(0, ds.shape[0], chunk):
                block = np.asarray(ds[i0 : i0 + chunk], dtype=np.float64)
                sq = np.tensordot(block**2, qw, axes=([2, 3], [0, 1]))
                sqsum += sq.sum(axis=0)
                ntot += block.shape[0]

    gmean = mean
    gvar = sqsum / ntot - gmean**2
    gstd = np.sqrt(np.maximum(gvar, 0.0))

    dstd = np.sqrt(np.maximum(dm2 / max(dcount, 1), 0.0))

    def save(name, arr, shape):
        np.save(os.path.join(output_dir, name), arr.reshape(shape).astype(np.float64))

    save("global_means.npy", gmean, (1, C, 1, 1))
    save("global_stds.npy", gstd, (1, C, 1, 1))
    save("mins.npy", mins, (1, C, 1, 1))
    save("maxs.npy", maxs, (1, C, 1, 1))
    save("time_diff_means.npy", dmean, (1, C, 1, 1))
    save("time_diff_stds.npy", dstd, (1, C, 1, 1))
    np.save(os.path.join(output_dir, "time_means.npy"), (tsum / max(tn, 1)).reshape(1, C, H, W).astype(np.float64))
    return dict(count=count, mean=gmean, std=gstd)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--h5_path", default="fields")
    parser.add_argument("--dt", type=int, default=1)
    parser.add_argument("--chunk", type=int, default=8)
    args = parser.parse_args()
    stats = compute_stats(args.input_dir, args.output_dir, args.h5_path, args.dt, args.chunk)
    print(f"processed {stats['count']} samples")


if __name__ == "__main__":
    main()
