"""Hydrostatic-balance residual climatology (ref
data_process/get_hydrostatic_balance_climatology.py:51-456).

Computes, over a makani HDF5 dataset, the per-interval statistics of the
hydrostatic residual

    r_k = (z_{k+1} - z_k) / R_d + 0.5 ln(p_{k+1}/p_k) (T_k + T_{k+1})

(optionally with the virtual-temperature moisture correction) in PHYSICAL
units: spatial mean/std per interval plus a time-mean residual map. These are
the normalization/bias inputs for the hydrostatic loss and the
hydrostatic-balance output constraint.

Outputs: hydrostatic_balance_{means, stds, time_means, pressures}.npy
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import h5py
import numpy as np

from makani_tpu.utils.losses.hydrostatic_loss import get_matching_channels_pl

_R_DRY_AIR = 287.052874247
_Q_CORR = 0.6078

__all__ = ["compute_hydrostatic_balance_climatology"]


def _residual(fields, z_idx, t_idx, q_idx, dlnp):
    """fields (T, C, H, W) physical -> residual (T, K, H, W)."""
    z = fields[:, z_idx]
    t = fields[:, t_idx]
    if q_idx is not None:
        t = t * (1.0 + _Q_CORR * fields[:, q_idx])
    return (z[:, 1:] - z[:, :-1]) / _R_DRY_AIR + 0.5 * dlnp[None, :, None, None] * (t[:, 1:] + t[:, :-1])


def compute_hydrostatic_balance_climatology(
    input_dir: str,
    output_path: str,
    metadata_file: str,
    p_min: float = 0,
    p_max: float = 1000,
    use_moist_air_formula: bool = False,
    h5_path: str = "fields",
    chunk: int = 16,
):
    with open(metadata_file) as f:
        metadata = json.load(f)
    channel_names = metadata["coords"]["channel"]

    z_idx, t_idx, pressures = get_matching_channels_pl(channel_names, "z", "t", p_min, p_max)
    if len(pressures) < 2:
        raise ValueError("need at least two matched (z, t) pressure levels")
    q_idx = None
    if use_moist_air_formula:
        q_idx, _, pq = get_matching_channels_pl(channel_names, "q", "t", p_min, p_max)
        if pq != pressures:
            raise ValueError("q channels must share the (z, t) pressure levels")
    dlnp = np.log(np.asarray(pressures[1:], np.float64) / np.asarray(pressures[:-1], np.float64)).astype(np.float32)

    files = sorted(glob.glob(os.path.join(input_dir, "*.h5")))
    if not files:
        raise IOError(f"no HDF5 files under {input_dir}")

    count = 0
    mean = None
    m2 = None
    tsum = None
    for path in files:
        with h5py.File(path, "r") as f:
            ds = f[h5_path]
            for s in range(0, ds.shape[0], chunk):
                block = np.asarray(ds[s : s + chunk], np.float32)
                res = _residual(block, z_idx, t_idx, q_idx, dlnp)  # (t, K, H, W)
                flat = res.reshape(res.shape[0], res.shape[1], -1)
                n_b = flat.shape[0] * flat.shape[2]
                mean_b = flat.mean(axis=(0, 2))
                m2_b = flat.var(axis=(0, 2)) * n_b
                if mean is None:
                    mean = np.zeros_like(mean_b)
                    m2 = np.zeros_like(mean_b)
                    tsum = np.zeros(res.shape[1:], np.float64)
                delta = mean_b - mean
                tot = count + n_b
                m2 += m2_b + delta**2 * count * n_b / tot
                mean += delta * n_b / tot
                count = tot
                tsum += res.sum(axis=0)

    n_times = count / tsum[0].size
    os.makedirs(output_path, exist_ok=True)
    np.save(os.path.join(output_path, "hydrostatic_balance_means.npy"), mean.reshape(1, -1, 1, 1).astype(np.float32))
    np.save(os.path.join(output_path, "hydrostatic_balance_stds.npy"), np.sqrt(m2 / count).reshape(1, -1, 1, 1).astype(np.float32))
    np.save(os.path.join(output_path, "hydrostatic_balance_time_means.npy"), (tsum / n_times)[None].astype(np.float32))
    np.save(os.path.join(output_path, "hydrostatic_balance_pressures.npy"), np.asarray(pressures, np.float32))
    return mean, np.sqrt(m2 / count)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--metadata_file", required=True)
    p.add_argument("--p_min", type=float, default=0)
    p.add_argument("--p_max", type=float, default=1000)
    p.add_argument("--use_moist_air_formula", action="store_true")
    args = p.parse_args()
    compute_hydrostatic_balance_climatology(
        args.input_dir, args.output_path, args.metadata_file, args.p_min, args.p_max, args.use_moist_air_formula
    )


if __name__ == "__main__":
    main()
