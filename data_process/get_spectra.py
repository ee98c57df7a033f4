"""Compute mean spherical-harmonic power spectra of a dataset
(ref makani data_process/get_spectra.py).

Usage: python -m data_process.get_spectra --input_dir /train --output /stats/spectra.h5
"""

from __future__ import annotations

import argparse
import glob
import os

import h5py
import numpy as np


def compute_spectra(input_dir: str, output_path: str, h5_path: str = "fields", grid: str = "equiangular", max_samples: int | None = None, chunk: int = 4):
    import jax.numpy as jnp

    from makani_tpu.ops.sht import RealSHT

    files = sorted(glob.glob(os.path.join(input_dir, "*.h5")))
    if not files:
        raise IOError(f"no h5 files in {input_dir}")

    with h5py.File(files[0], "r") as f:
        _, C, H, W = f[h5_path].shape

    sht = RealSHT(H, W, grid=grid)
    mw = np.full(sht.mmax, 2.0, np.float32)
    mw[0] = 1.0

    total = np.zeros((C, sht.lmax), np.float64)
    n = 0
    for path in files:
        with h5py.File(path, "r") as f:
            ds = f[h5_path]
            for i0 in range(0, ds.shape[0], chunk):
                block = np.asarray(ds[i0 : i0 + chunk], np.float32)
                c2 = sht.analysis(jnp.asarray(block))
                power = (np.asarray(c2[..., 0]) ** 2 + np.asarray(c2[..., 1]) ** 2) * mw
                total += power.sum(axis=(0, 3))
                n += block.shape[0]
                if max_samples and n >= max_samples:
                    break

    spectra = (total / max(n, 1)).astype(np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with h5py.File(output_path, "w") as f:
        f.create_dataset("spectrum", data=spectra)
        f.attrs["n_samples"] = n
    return spectra


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--h5_path", default="fields")
    parser.add_argument("--grid", default="equiangular")
    parser.add_argument("--max_samples", type=int, default=None)
    args = parser.parse_args()
    compute_spectra(args.input_dir, args.output, args.h5_path, args.grid, args.max_samples)


if __name__ == "__main__":
    main()
