"""Portable inference packages (ref makani/models/model_package.py:37-530).

A model package is a self-contained directory holding everything needed to
run a trained model outside the training harness:

    config.yaml          — full parameter dump
    params/              — orbax checkpoint of the model weights
    stats/               — normalization bias/scale arrays (npy)

``save_model_package`` writes it; ``load_model_package`` reconstructs the
wrapped model and returns a ``ModelWrapper`` — a plain callable mapping a
physical input field (plus optional zenith channels) to the physical
prediction, with normalization folded in (the reference's
``ModelWrapper(x, time)`` surface).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp
import yaml

from makani_tpu.utils.yparams import ParamsBase

__all__ = ["save_model_package", "load_model_package", "LocalPackage", "ModelWrapper"]


class LocalPackage:
    """Filesystem-backed package handle (ref model_package.py:37-90)."""

    def __init__(self, root: str):
        self.root = root

    def get(self, path: str) -> str:
        return os.path.join(self.root, path)


def save_model_package(params, model_params, directory: str):
    os.makedirs(directory, exist_ok=True)

    cfg = {k: v for k, v in params.to_dict().items() if not isinstance(v, np.ndarray)}
    with open(os.path.join(directory, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(directory, "params")), model_params)
    ckptr.wait_until_finished()

    stats_dir = os.path.join(directory, "stats")
    os.makedirs(stats_dir, exist_ok=True)
    try:
        from makani_tpu.utils.dataloaders.data_helpers import get_data_normalization, get_out_normalization

        bias, scale = get_data_normalization(params)
        np.save(os.path.join(stats_dir, "bias.npy"), bias)
        np.save(os.path.join(stats_dir, "scale.npy"), scale)
        # out stats differ when out_channels reorders/subsets in_channels
        out_bias, out_scale = get_out_normalization(params)
        np.save(os.path.join(stats_dir, "out_bias.npy"), out_bias)
        np.save(os.path.join(stats_dir, "out_scale.npy"), out_scale)
    except Exception:
        pass
    return LocalPackage(directory)


class ModelWrapper:
    """Plain physical-units callable around a restored model
    (ref model_package.py:200-380)."""

    def __init__(self, model, model_params, bias=None, scale=None, out_bias=None, out_scale=None):
        self.model = model
        self.model_params = model_params
        self.bias = None if bias is None else jnp.asarray(bias)
        self.scale = None if scale is None else jnp.asarray(scale)
        self.out_bias = None if out_bias is None else jnp.asarray(out_bias)
        self.out_scale = None if out_scale is None else jnp.asarray(out_scale)
        self._apply = jax.jit(lambda p, x, z: model.apply(p, x, z, train=False))

    def __call__(self, x, zenith=None):
        if self.bias is not None:
            x = (x - self.bias) / self.scale
        y = self._apply(self.model_params, x, zenith)
        if self.out_bias is not None:
            y = y * self.out_scale + self.out_bias
        elif self.bias is not None:
            # legacy packages without out stats: assume out is an in prefix
            nb = y.shape[1]
            y = y * self.scale[:, :nb] + self.bias[:, :nb]
        return y


def load_model_package(directory_or_package) -> ModelWrapper:
    package = directory_or_package if isinstance(directory_or_package, LocalPackage) else LocalPackage(str(directory_or_package))

    with open(package.get("config.yaml")) as f:
        params = ParamsBase(yaml.safe_load(f))

    from makani_tpu.models.model_registry import get_model

    model, _pre = get_model(params, multistep=True)

    H, W = params.get("img_shape_x"), params.get("img_shape_y")
    n_in_flat = (params.get("n_history", 0) + 1) * len(params.get("in_channels"))
    dummy = jnp.zeros((1, n_in_flat, H, W), jnp.float32)
    dz = jnp.zeros((1, params.get("n_history", 0) + 1 + params.get("n_future", 0), 1, H, W), jnp.float32) if params.get("add_zenith", False) else None
    template = model.init(jax.random.PRNGKey(0), dummy, dz)

    ckptr = ocp.StandardCheckpointer()
    model_params = ckptr.restore(os.path.abspath(package.get("params")), template)

    bias = scale = out_bias = out_scale = None
    bias_path = package.get("stats/bias.npy")
    if os.path.isfile(bias_path):
        bias = np.load(bias_path)
        scale = np.load(package.get("stats/scale.npy"))
    ob_path = package.get("stats/out_bias.npy")
    if os.path.isfile(ob_path):
        out_bias = np.load(ob_path)
        out_scale = np.load(package.get("stats/out_scale.npy"))

    return ModelWrapper(model, model_params, bias=bias, scale=scale, out_bias=out_bias, out_scale=out_scale)
