"""Rechunk / recompress yearly HDF5 files and annotate them with dimension
scales (ref makani data_process/h5_convert.py + annotate_dataset.py).

Usage:
    python -m data_process.h5_convert --input in.h5 --output out.h5 \
        [--chunk_channels 1] [--compression none|gzip|lzf]
    python -m data_process.h5_convert annotate --input f.h5 --metadata data.json
"""

from __future__ import annotations

import argparse
import json

import h5py
import numpy as np


def convert(input_path: str, output_path: str, h5_path: str = "fields", chunk_channels: int = 0, compression: str = "none"):
    with h5py.File(input_path, "r") as fi, h5py.File(output_path, "w") as fo:
        ds = fi[h5_path]
        N, C, H, W = ds.shape
        chunks = (1, chunk_channels or C, H, W)
        kwargs = {}
        if compression != "none":
            kwargs["compression"] = compression
        out = fo.create_dataset(h5_path, shape=ds.shape, dtype=ds.dtype, chunks=chunks, **kwargs)
        for i in range(N):
            out[i] = ds[i]
        for key in fi:
            if key != h5_path:
                fo.create_dataset(key, data=fi[key][...])
        for k, v in fi.attrs.items():
            fo.attrs[k] = v


def annotate(input_path: str, metadata_path: str, h5_path: str = "fields", year: int | None = None, dhours: int = 6):
    """Attach timestamp/lat/lon/channel dimension scales from data.json."""
    with open(metadata_path) as f:
        meta = json.load(f)
    coords = meta["coords"]
    with h5py.File(input_path, "a") as f:
        N = f[h5_path].shape[0]
        if "timestamp" not in f:
            if year is None:
                raise ValueError("annotating timestamps requires --year")
            t0 = np.datetime64(f"{year}-01-01T00:00:00").astype("datetime64[s]").astype(np.int64)
            f.create_dataset("timestamp", data=t0 + np.arange(N) * dhours * 3600)
        for name, vals in (("lat", coords["lat"]), ("lon", coords["lon"])):
            if name not in f:
                f.create_dataset(name, data=np.asarray(vals))
        if "channel" not in f:
            f.create_dataset("channel", data=np.array(coords["channel"], dtype="S"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", nargs="?", default="convert", choices=["convert", "annotate"])
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", default=None)
    parser.add_argument("--metadata", default=None)
    parser.add_argument("--h5_path", default="fields")
    parser.add_argument("--chunk_channels", type=int, default=0)
    parser.add_argument("--compression", default="none")
    parser.add_argument("--year", type=int, default=None)
    args = parser.parse_args()
    if args.mode == "convert":
        convert(args.input, args.output, args.h5_path, args.chunk_channels, args.compression)
    else:
        annotate(args.input, args.metadata, args.h5_path, args.year)


if __name__ == "__main__":
    main()
