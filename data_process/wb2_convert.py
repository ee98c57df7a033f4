"""WeatherBench2 <-> makani dataset conversion (ref data_process/
convert_wb2_to_makani_input.py, convert_makani_output_to_wb2.py,
generate_wb2_climatology.py).

The channel-name and layout mapping (makani "(var)(level)" channels <->
WB2 per-variable arrays with a level axis) lives in
``makani_tpu/utils/dataloaders/wb2_helpers.py`` and is unit-tested there.
This CLI wires it to zarr/xarray IO when those packages are available; the
execution environment ships without them, so the IO path is import-gated and
raises a clear error instead of failing at call depth.
"""

from __future__ import annotations

import argparse
import json
import os

import h5py
import numpy as np

from makani_tpu.utils.dataloaders.wb2_helpers import from_wb2_layout, to_wb2_layout

try:  # pragma: no cover - zarr/xarray not in the TPU image
    import xarray as xr

    _HAVE_XARRAY = True
except ImportError:
    _HAVE_XARRAY = False


def _require_xarray():
    if not _HAVE_XARRAY:
        raise ImportError(
            "WB2 zarr conversion needs xarray+zarr, which are not installed in "
            "this environment. The layout mapping itself (to_wb2_layout/"
            "from_wb2_layout) is pure numpy and available without them."
        )


def wb2_to_makani(wb2_path: str, output_dir: str, channel_names, years, h5_path: str = "fields", chunk: int = 8):
    """Read a WB2 zarr store and write yearly makani HDF5 files."""
    _require_xarray()
    ds = xr.open_zarr(wb2_path)
    os.makedirs(output_dir, exist_ok=True)
    for year in years:
        sel = ds.sel(time=slice(f"{year}-01-01", f"{year}-12-31"))
        T = sel.sizes["time"]
        H, W = sel.sizes["latitude"], sel.sizes["longitude"]
        with h5py.File(os.path.join(output_dir, f"{year}.h5"), "w") as f:
            out = f.create_dataset(h5_path, shape=(T, len(channel_names), H, W), dtype=np.float32)
            for s in range(0, T, chunk):
                block = {v: np.asarray(sel[v][s : s + chunk]) for v in sel.data_vars}
                out[s : s + chunk] = from_wb2_layout(block, channel_names)
            ts = sel["time"].values.astype("datetime64[s]").astype(np.int64)
            f.create_dataset("timestamp", data=ts)


def makani_to_wb2(h5_file: str, output_path: str, channel_names, h5_path: str = "fields"):
    """Write a makani HDF5 file as a WB2-layout zarr store."""
    _require_xarray()
    with h5py.File(h5_file, "r") as f:
        fields = np.asarray(f[h5_path])
        ts = np.asarray(f["timestamp"]) if "timestamp" in f else np.arange(fields.shape[0])
    data = to_wb2_layout(fields, channel_names)
    coords = {"time": ts.astype("datetime64[s]")}
    arrays = {}
    for var, arr in data.items():
        dims = ("time", "level", "latitude", "longitude") if arr.ndim == 4 else ("time", "latitude", "longitude")
        arrays[var] = (dims, arr)
    xr.Dataset(arrays, coords=coords).to_zarr(output_path, mode="w")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--direction", choices=["wb2_to_makani", "makani_to_wb2"], required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--metadata_file", required=True)
    p.add_argument("--years", nargs="*", type=int, default=[])
    args = p.parse_args()
    with open(args.metadata_file) as f:
        names = json.load(f)["coords"]["channel"]
    if args.direction == "wb2_to_makani":
        wb2_to_makani(args.input, args.output, names, args.years)
    else:
        makani_to_wb2(args.input, args.output, names)


if __name__ == "__main__":
    main()
