"""Measure disk->host dataloader throughput at 0.25-degree shapes
(VERDICT r1 item 4: the round-1 'effective_io_rate_gbs' measured device-put
of already-loaded arrays, not disk->host).

Creates a synthetic 73ch 721x1440 yearly HDF5 (~300 MB/sample fp32), then
measures MultifilesDataset sample reads: full-grid reads and per-tile
(io_tile) reads. Prints GB/s for both.

    python scripts/measure_io.py [--samples 8] [--dir /tmp/io_bench]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dataset(path: str, n_samples: int, C: int = 73, H: int = 721, W: int = 1440, contiguous: bool = False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.isfile(path):
        with h5py.File(path, "r") as f:
            if f["fields"].shape[0] >= n_samples:
                return
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        # contiguous = the layout of real ERA5 yearly files, and what the
        # reference's DALI O_DIRECT reader requires (dali_es_helper_2d.py)
        chunks = None if contiguous else (1, 1, H, W)
        ds = f.create_dataset("fields", shape=(n_samples, C, H, W), dtype="f4", chunks=chunks)
        for i in range(n_samples):
            ds[i] = rng.randn(C, H, W).astype(np.float32)
        t0 = np.datetime64("2017-01-01T00:00:00").astype("datetime64[s]").astype(np.int64)
        f.create_dataset("timestamp", data=t0 + np.arange(n_samples) * 6 * 3600)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--samples", type=int, default=8)
    parser.add_argument("--dir", type=str, default="/tmp/io_bench")
    args = parser.parse_args()

    from makani_tpu.utils.dataloaders.data_loader_multifiles import MultifilesDataset
    from makani_tpu.utils.yparams import ParamsBase

    path = os.path.join(args.dir, "train", "2017.h5")
    build_dataset(path, args.samples + 2)
    cpath = os.path.join(args.dir, "train_contig", "2017.h5")
    build_dataset(cpath, args.samples + 2, contiguous=True)

    C, H, W = 73, 721, 1440
    base = dict(
        channel_names=[f"ch{i}" for i in range(C)],
        in_channels=list(range(C)),
        out_channels=list(range(C)),
        n_history=0,
        n_future=0,
        dt=1,
        dhours=6,
        add_zenith=False,
        global_means_path=None,
        global_stds_path=None,
        normalization="none",
    )

    def measure(tag, extra, p=path):
        params = ParamsBase(dict(base, **extra))
        ds = MultifilesDataset(params, os.path.dirname(p), train=True)
        n = min(args.samples, len(ds))
        rates = []
        # pass 1 includes cold page-cache misses (storage-bound on first
        # touch); pass 2 is warm and measures the software path itself
        for pas in (1, 2):
            t0 = time.perf_counter()
            nbytes = 0
            for i in range(n):
                s = ds[i]
                nbytes += s["inp"].nbytes + s["tar"].nbytes
            dt = time.perf_counter() - t0
            rates.append(nbytes / dt / 1e9)
        print(f"{tag}: cold {rates[0]:.2f} GB/s / warm {rates[1]:.2f} GB/s ({nbytes / 1e9:.1f} GB per pass, {n} samples)")
        return rates[1]

    full = measure("full-grid reads, chunked file (721x1440)", {})
    tile = measure("per-tile reads, chunked file (io_tile h/2 x w/2)", {"io_tile_x": (0, 361), "io_tile_y": (0, 720)})
    print(f"tile read volume is 1/4; rate ratio {tile / full:.2f}x")
    measure("full-grid reads, CONTIGUOUS file (memmap path)", {}, p=cpath)
    measure("per-tile reads, CONTIGUOUS file", {"io_tile_x": (0, 361), "io_tile_y": (0, 720)}, p=cpath)

    # grain multi-worker pipeline at the same shapes (the DALI replacement)
    try:
        from makani_tpu.utils.dataloaders.data_loader_grain import GrainDataLoader

        params = ParamsBase(dict(base))
        ds = MultifilesDataset(params, os.path.dirname(path), train=True)
        loader = GrainDataLoader(ds, batch_size=2, shuffle=False, num_workers=4, prefetch=2)
        t0 = time.perf_counter()
        nbytes = 0
        nb = 0
        for batch in loader:
            nbytes += batch["inp"].nbytes + batch["tar"].nbytes
            nb += 1
            if nb * 2 >= args.samples:
                break
        dt = time.perf_counter() - t0
        print(f"grain pipeline (4 workers): {nbytes / dt / 1e9:.2f} GB/s ({nbytes / 1e9:.1f} GB in {dt:.1f}s)")
    except ImportError:
        print("grain not available")


if __name__ == "__main__":
    main()
