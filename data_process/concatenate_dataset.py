"""Virtually concatenate yearly HDF5 files into one dataset (ref
data_process/concatenate_dataset.py:27-310).

Builds an HDF5 *virtual* dataset: time-concatenation across the per-year
files, channel-concatenation across input directories, with optional temporal
thinning (``dhoursrel``: keep every n-th sample). Only a small file of
references is written; sources are referenced by relative path so the virtual
file stays valid when the directory is mounted elsewhere. Also writes the
``timestamp`` dataset derived from each file's year and the metadata's
``dhours``.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

import h5py as h5
import numpy as np

__all__ = ["concatenate"]


def concatenate(
    input_dirs: List[str],
    output_file: str,
    metadata: dict,
    channel_names: List[List[str]],
    file_names_to_concatenate: List[str],
    years: List[int],
    dhoursrel: int = 1,
    entry_key: str = "fields",
):
    if len(years) != len(file_names_to_concatenate):
        raise ValueError("need one year per file")
    if len(channel_names) != len(input_dirs):
        raise ValueError("need one channel-name list per input directory")

    for d in input_dirs:
        for fname in file_names_to_concatenate:
            if not os.path.isfile(os.path.join(d, fname)):
                raise FileNotFoundError(f"{fname} not found in {d}")

    # shapes per year (from the first directory; all dirs must agree in time)
    entries = []
    with h5.File(os.path.join(input_dirs[0], file_names_to_concatenate[0]), "r") as f:
        _, _, H, W = f[entry_key].shape
        dtype = f[entry_key].dtype
    for fname in file_names_to_concatenate:
        with h5.File(os.path.join(input_dirs[0], fname), "r") as f:
            entries.append(f[entry_key].shape[0])

    chans_per_dir = [len(c) for c in channel_names]
    C = sum(chans_per_dir)
    kept = [(n + dhoursrel - 1) // dhoursrel for n in entries]
    T = sum(kept)

    dhours = metadata.get("dhours", 6) * dhoursrel
    out_dir = os.path.dirname(os.path.abspath(output_file))

    layout = h5.VirtualLayout(shape=(T, C, H, W), dtype=dtype)
    t0 = 0
    timestamps = np.empty((T,), np.int64)
    for fname, year, n, k in zip(file_names_to_concatenate, years, entries, kept):
        c0 = 0
        for d, nc in zip(input_dirs, chans_per_dir):
            rel = os.path.relpath(os.path.join(d, fname), out_dir)
            src = h5.VirtualSource(rel, entry_key, shape=(n, nc, H, W))
            layout[t0 : t0 + k, c0 : c0 + nc] = src[::dhoursrel]
            c0 += nc
        base = np.datetime64(f"{year}-01-01T00:00:00").astype("datetime64[s]").astype(np.int64)
        timestamps[t0 : t0 + k] = base + np.arange(k) * dhours * 3600
        t0 += k

    with h5.File(output_file, "w") as f:
        f.create_virtual_dataset(entry_key, layout, fillvalue=np.nan)
        f.create_dataset("timestamp", data=timestamps)
        names = [n for sub in channel_names for n in sub]
        f.create_dataset("channel", data=np.array(names, dtype="S"))
        f.attrs["dhours"] = dhours

    return output_file


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--metadata_file", required=True)
    p.add_argument("--input_dirs", nargs="+", required=True)
    p.add_argument("--output_file", required=True)
    p.add_argument("--years", nargs="+", type=int, required=True)
    p.add_argument("--dhoursrel", type=int, default=1)
    args = p.parse_args()

    with open(args.metadata_file) as f:
        metadata = json.load(f)
    names = metadata["coords"]["channel"]
    files = [f"{y}.h5" for y in args.years]
    concatenate(args.input_dirs, args.output_file, metadata, [names] * len(args.input_dirs), files, args.years, args.dhoursrel)


if __name__ == "__main__":
    main()
