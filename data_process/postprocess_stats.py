"""Post-process dataset statistics (ref data_process/postprocess_stats.py:24-68):
clamp water-channel minima to physical zero and floor the stds at 1e-4."""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil

import numpy as np


def postprocess(metadata_file: str, input_path: str, output_path: str):
    with open(metadata_file) as f:
        metadata = json.load(f)
    channel_names = metadata["coords"]["channel"]

    os.makedirs(output_path, exist_ok=True)
    for f in glob.iglob(os.path.join(input_path, "*.npy")):
        shutil.copyfile(f, os.path.join(output_path, os.path.basename(f)))

    mins_file = os.path.join(output_path, "mins.npy")
    if os.path.isfile(mins_file):
        mins = np.load(mins_file)
        for c, chn in enumerate(channel_names):
            if chn.startswith("q") or chn == "tcwv":
                mins[0, c, 0, 0] = 0.0
        np.save(mins_file, mins)

    for name in ("global_stds.npy", "time_diff_stds.npy"):
        path = os.path.join(output_path, name)
        if os.path.isfile(path):
            np.save(path, np.maximum(np.load(path), 1e-4))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--metadata_file", required=True)
    p.add_argument("--input_path", required=True)
    p.add_argument("--output_path", required=True)
    args = p.parse_args()
    postprocess(args.metadata_file, args.input_path, args.output_path)


if __name__ == "__main__":
    main()
