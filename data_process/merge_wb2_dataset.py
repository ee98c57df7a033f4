"""Transfer channels between annotated makani-format HDF5 datasets
(ref data_process/merge_wb2_dataset.py).

Typical use: a WeatherBench2-derived dataset was converted with only a channel
subset (convert_wb2_to_makani_input.py); this copies named channels from a
second converted file into their slots in the target file, matching channels
by name via the ``channel`` annotation.

The reference parallelizes over MPI ranks with mpio-driver HDF5; here the
batched copies run through a thread pool (h5py releases the GIL during IO),
which saturates local disks without an MPI dependency.

    python -m data_process.merge_wb2_dataset --input in.h5 --output out.h5 \
        --channels u10m v10m --batch_size 32
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import threading
import time

import h5py
import numpy as np


def transfer_channels(
    input_file: str,
    output_file: str,
    channels,
    batch_size: int = 32,
    entry_key: str = "fields",
    num_workers: int = 4,
    verbose: bool = False,
):
    """Copy ``channels`` (by name) from input_file into output_file in place.

    Both files must be annotated with a ``channel`` dataset; sample counts
    must match.
    """
    with h5py.File(input_file, "r") as f:
        n_in = f[entry_key].shape[0]
        channels_in = [x.decode() if isinstance(x, bytes) else str(x) for x in f["channel"][...]]
    with h5py.File(output_file, "r") as f:
        n_out = f[entry_key].shape[0]
        channels_out = [x.decode() if isinstance(x, bytes) else str(x) for x in f["channel"][...]]

    if n_in != n_out:
        raise IndexError(f"{input_file} and {output_file} have different sample counts ({n_in} vs {n_out})")

    pairs = []
    for ch in channels:
        if ch not in channels_in:
            raise KeyError(f"channel {ch} not in {input_file} ({channels_in})")
        if ch not in channels_out:
            raise KeyError(f"channel {ch} not in {output_file} ({channels_out})")
        pairs.append((channels_in.index(ch), channels_out.index(ch)))

    t0 = time.perf_counter()
    lock = threading.Lock()

    fin = h5py.File(input_file, "r")
    fout = h5py.File(output_file, "a")
    try:
        din, dout = fin[entry_key], fout[entry_key]

        def copy_block(ci, co, lo, hi):
            data = din[lo:hi, ci]
            with lock:  # single writer per HDF5 handle
                dout[lo:hi, co] = data
            return hi - lo

        jobs = [
            (ci, co, lo, min(lo + batch_size, n_in))
            for (ci, co) in pairs
            for lo in range(0, n_in, batch_size)
        ]
        done = 0
        with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
            for n in pool.map(lambda j: copy_block(*j), jobs):
                done += n
                if verbose:
                    print(f"\r{done}/{n_in * len(pairs)} samples", end="", flush=True)
    finally:
        fin.close()
        fout.close()

    if verbose:
        print(f"\ntransferred {len(pairs)} channels in {time.perf_counter() - t0:.1f}s")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="annotated makani HDF5 source")
    parser.add_argument("--output", required=True, help="annotated makani HDF5 target (modified in place)")
    parser.add_argument("--channels", nargs="+", required=True)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--entry_key", type=str, default="fields")
    args = parser.parse_args()
    transfer_channels(
        args.input, args.output, args.channels, args.batch_size, args.entry_key, args.num_workers, verbose=True
    )


if __name__ == "__main__":
    main()
