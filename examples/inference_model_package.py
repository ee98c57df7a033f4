"""Standalone inference through a makani_tpu model package.

Headless-script equivalent of the reference's
``notebooks/inference_model_package.ipynb``: load a model package, pick an
initial condition from an ERA5-style HDF5 file, roll the model forward
autoregressively in physical units, and write comparison plots.

Real data:

    python examples/inference_model_package.py \
        --package /runs/fcn3_finetune/flexible \
        --data /out_of_sample/2018.h5 --metadata /metadata/data.json \
        --ic-time 2018-01-01T00:00:00 --steps 18 --channel u10m --out plots/

Demo / CI mode (no data or trained package needed — builds a tiny model on
synthetic data, saves a package, then runs the identical inference path):

    python examples/inference_model_package.py --demo --out /tmp/pkg_demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rollout(wrapper, x0, lat, lon, base_time, dhours, steps):
    """Autoregressive rollout in physical units; zenith recomputed per step
    (the notebook's model_package(pred, time) loop)."""
    import jax.numpy as jnp

    from makani_tpu.utils.zenith_angle import cos_zenith_angle_from_timestamp

    cfg = wrapper.model_params  # noqa: F841 (kept for interactive poking)
    needs_zenith = getattr(wrapper, "needs_zenith", True)
    lon2d, lat2d = np.meshgrid(lon, lat)

    pred = jnp.asarray(x0[None])
    frames = []
    t = float(base_time)
    for _ in range(steps):
        zen = None
        if needs_zenith:
            z = cos_zenith_angle_from_timestamp(t, lon2d, lat2d).astype(np.float32)
            zen = jnp.asarray(z[None, None, None])
        pred = wrapper(pred, zen)
        t += dhours * 3600.0
        frames.append(np.asarray(pred[0]))
    return np.stack(frames)  # (steps, C, H, W)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--package", help="model package directory (save_model_package output)")
    ap.add_argument("--data", help="ERA5-style HDF5 file with 'fields' (T, C, H, W)")
    ap.add_argument("--metadata", help="dataset data.json (channel names, dhours, coords)")
    ap.add_argument("--ic-time", default=None, help="initial-condition ISO time (default: first sample)")
    ap.add_argument("--steps", type=int, default=4, help="autoregressive steps")
    ap.add_argument("--channel", default="u10m", help="channel to plot")
    ap.add_argument("--out", default="package_inference_out", help="output directory for plots")
    ap.add_argument("--demo", action="store_true", help="self-contained demo on synthetic data")
    ap.add_argument("--platform", default=None, help="force a jax platform (e.g. 'cpu' for CI; the sandbox's axon plugin ignores JAX_PLATFORMS)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    os.makedirs(args.out, exist_ok=True)

    if args.demo:
        args.package, args.data, args.metadata = _make_demo_package(args.out)

    if not (args.package and args.data and args.metadata):
        ap.error("--package/--data/--metadata are required (or use --demo)")

    import h5py

    from makani_tpu.models.model_package import load_model_package
    from makani_tpu.utils.visualize import plot_comparison, plot_field

    wrapper = load_model_package(args.package)
    with open(os.path.join(args.package, "config.yaml")) as f:
        import yaml

        pkg_cfg = yaml.safe_load(f)
    variables = [pkg_cfg["channel_names"][i] for i in pkg_cfg["in_channels"]]

    meta = json.load(open(args.metadata))
    era5_channels = meta["coords"]["channel"]
    dhours = meta.get("dhours", 6)
    lat = np.asarray(meta["coords"]["lat"])
    lon = np.asarray(meta["coords"]["lon"])
    ich = [era5_channels.index(c) for c in variables]

    with h5py.File(args.data, "r") as f:
        fields = f["fields"]
        ts = np.asarray(f["timestamp"]) if "timestamp" in f else None
        if args.ic_time and ts is not None:
            want = np.datetime64(args.ic_time).astype("datetime64[s]").astype(np.int64)
            iic = int(np.argmin(np.abs(ts - want)))
        else:
            iic = 0
        base_time = float(ts[iic]) if ts is not None else 0.0
        x0 = np.asarray(fields[iic, ich], np.float32)
        n_truth = min(args.steps, fields.shape[0] - 1 - iic)
        truth = np.asarray(fields[iic + 1 : iic + 1 + n_truth, ich], np.float32)

    wrapper.needs_zenith = bool(pkg_cfg.get("add_zenith", False))
    frames = rollout(wrapper, x0, lat, lon, base_time, dhours, args.steps)

    ci = variables.index(args.channel)
    plot_field(frames[-1, ci], title=f"{args.channel} forecast, step {args.steps}", path=os.path.join(args.out, f"{args.channel}_forecast.png"))
    if n_truth >= args.steps:
        plot_comparison(
            frames[-1, ci],
            truth[args.steps - 1, ci],
            title=f"{args.channel} at +{args.steps * dhours}h",
            path=os.path.join(args.out, f"{args.channel}_vs_era5.png"),
        )
        rmse = float(np.sqrt(np.mean((frames[-1, ci] - truth[args.steps - 1, ci]) ** 2)))
        print(f"step-{args.steps} {args.channel} RMSE vs data: {rmse:.4f}")
    print(f"rollout: {frames.shape[0]} steps x {len(variables)} channels; plots in {args.out}")
    return 0


def _make_demo_package(out_dir):
    """Train nothing: init a tiny SFNO on synthetic stats, save a package."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from testutils import get_default_parameters, init_hdf5_dataset

    root = os.path.join(out_dir, "demo_data")
    os.makedirs(root, exist_ok=True)
    paths = init_hdf5_dataset(root)
    params = get_default_parameters(root, **paths)

    from makani_tpu.models.model_package import save_model_package
    from makani_tpu.models.model_registry import get_model

    model, _ = get_model(params, multistep=True)
    H, W = params["img_shape_x"], params["img_shape_y"]
    x = jnp.zeros((1, len(params["in_channels"]), H, W))
    zen = jnp.zeros((1, 1, 1, H, W))
    p = model.init(jax.random.PRNGKey(0), x, zen)
    pkg = os.path.join(out_dir, "package")
    save_model_package(params, p, pkg)

    data = os.path.join(root, "train", sorted(os.listdir(os.path.join(root, "train")))[0])
    return pkg, data, paths["metadata_json_path"]


if __name__ == "__main__":
    sys.exit(main())
