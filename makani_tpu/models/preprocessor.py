"""Input/output preprocessing (ref makani/models/preprocessor.py:42-1057).

Functional redesign of the reference's stateful ``Preprocessor2D``: on TPU the
whole training step is one jit-compiled pure function, so the reference's
mutable buffers (cached unpredicted features, noise state, RNG) become
explicit arguments threaded by the stepper and trainer. What remains here is
the static configuration and the pure array transformations:

  * history window flatten/expand and sliding (``append_history``),
  * appending dynamic unpredicted channels (zenith angle) per step,
  * appending time-invariant static features (grid embedding, orography,
    land-sea mask),
  * history-based normalization (exponential/mean weighted, quadrature
    spatial means) and its inverse,
  * static bias correction of the model output.

Standard z-score/minmax normalization happens in the data pipeline, exactly
as in the reference (the DALI/multifiles loaders own in_bias/in_scale).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from makani_tpu.utils.features import get_auxiliary_channels
from makani_tpu.utils.grids import GridQuadrature, grid_to_quadrature_rule

__all__ = ["Preprocessor2D", "get_preprocessor", "get_static_features"]


def _read_field(path: str, candidates=("orog", "z", "Z", "lsm", "LSM", "field")):
    """Read a 2D static field from .npy or netCDF4/HDF5 file."""
    if path.endswith(".npy"):
        arr = np.load(path)
    else:
        import h5py

        with h5py.File(path, "r") as f:
            key = None
            for c in candidates:
                if c in f:
                    key = c
                    break
            if key is None:
                # fall back to the first 2D+ dataset
                def visit(name, obj):
                    nonlocal key
                    if key is None and hasattr(obj, "shape") and len(obj.shape) >= 2:
                        key = name

                f.visititems(visit)
            if key is None:
                raise IOError(f"no 2D dataset found in {path}")
            arr = np.asarray(f[key])
    arr = np.squeeze(arr)
    if arr.ndim != 2:
        raise IOError(f"static field in {path} is not 2D (shape {arr.shape})")
    return arr.astype(np.float32)


def get_static_features(params) -> Optional[np.ndarray]:
    """Assemble static features (1, n_static, H, W) in numpy
    (ref preprocessor_helpers.py:72-301): grid embedding, orography, landmask."""
    feats = []

    if params.get("add_grid", False):
        if params.get("lat") is not None and params.get("lon") is not None:
            tx = np.deg2rad(np.asarray(params.get("lat"), dtype=np.float32))
            ty = np.deg2rad(np.asarray(params.get("lon"), dtype=np.float32))
        else:
            tx = np.linspace(0, 1, params.img_shape_x + 1, dtype=np.float32)[:-1]
            ty = np.linspace(0, 1, params.img_shape_y + 1, dtype=np.float32)[:-1]
        xg, yg = np.meshgrid(tx, ty, indexing="ij")
        grid = np.stack([xg, yg])[None]  # (1, 2, H, W)
        if params.get("gridtype", "sinusoidal") == "sinusoidal":
            num_freq = params.get("grid_num_frequencies", 1)
            add_cos = params.get("add_cos_to_grid", True)
            chans = []
            for freq in range(1, num_freq + 1):
                chans.append(np.sin(freq * grid))
                if add_cos:
                    chans.append(np.cos(freq * grid))
            feats.append(np.concatenate(chans, axis=1))
        else:
            feats.append(grid)

    if params.get("add_orography", False):
        oro = _read_field(params.get("orography_path"))
        oro = (oro - oro.mean()) / (oro.std() + 1e-6)
        feats.append(oro[None, None])

    if params.get("add_landmask", False):
        lsm = _read_field(params.get("landmask_path"), candidates=("lsm", "LSM", "land_sea_mask", "mask"))
        prep = params.get("landmask_preprocessing", "floor")
        if prep in ("floor", "round"):
            ilsm = np.floor(lsm).astype(np.int64) if prep == "floor" else np.round(lsm).astype(np.int64)
            n = int(ilsm.max()) + 1
            onehot = np.eye(n, dtype=np.float32)[ilsm]  # (H, W, n)
            feats.append(np.transpose(onehot, (2, 0, 1))[None])
        else:
            feats.append(lsm[None, None])

    if params.get("add_soiltype", False):
        # soil type classes 0 (sea) .. 7, one-hot into 8 channels
        # (ref auxiliary_fields.py:40-47 + features.py xst0..7)
        st = _read_field(params.get("soiltype_path"), candidates=("slt", "SLT", "soiltype"))
        ist = np.clip(np.round(st).astype(np.int64), 0, 7)
        onehot = np.eye(8, dtype=np.float32)[ist]  # (H, W, 8)
        feats.append(np.transpose(onehot, (2, 0, 1))[None])

    if params.get("add_copernicus_emb", False):
        # learned 8-dim static surface embedding, stored (H, W, 8) or
        # (8, H, W) npy (ref auxiliary_fields.py:58-66 + features.py xcop0..7)
        emb = np.load(params.get("copernicus_emb_path")).astype(np.float32)
        emb = np.squeeze(emb)
        if emb.ndim != 3:
            raise IOError(f"copernicus embedding is not 3D (shape {emb.shape})")
        hw = (params.get("img_shape_x"), params.get("img_shape_y"))
        if emb.shape[:2] == hw:  # stored (H, W, 8) -> (8, H, W)
            emb = np.transpose(emb, (2, 0, 1))
        elif emb.shape[1:] != hw:
            raise IOError(f"copernicus embedding shape {emb.shape} does not match the grid {hw}")
        feats.append(emb[None])

    if not feats:
        return None
    return np.concatenate(feats, axis=1).astype(np.float32)


def get_bias_correction(params) -> Optional[np.ndarray]:
    path = params.get("bias_correction", None)
    if path is None:
        return None
    bias = np.load(path).astype(np.float32)
    if bias.ndim == 3:
        bias = bias[None]
    out_ch = params.get("out_channels")
    if out_ch is not None and bias.shape[1] != len(out_ch):
        bias = bias[:, out_ch]
    return bias


class Preprocessor2D:
    """Pure preprocessing helper shared by the step wrappers."""

    def __init__(self, params):
        self.n_history = params.get("n_history", 0)
        self.history_normalization_mode = params.get("history_normalization_mode", "none")
        self.history_eps = 1e-6
        self.img_shape = (params.get("img_shape_x"), params.get("img_shape_y"))

        if self.history_normalization_mode == "exponential":
            decay = params.get("history_normalization_decay", 1.0)
            w = np.exp(-decay * np.arange(self.n_history, -1, -1, dtype=np.float32))
            self.history_normalization_weights = (w / w.sum()).reshape(1, -1, 1, 1, 1)
        elif self.history_normalization_mode == "mean":
            w = np.full((self.n_history + 1,), 1.0 / (self.n_history + 1), np.float32)
            self.history_normalization_weights = w.reshape(1, -1, 1, 1, 1)
        else:
            self.history_normalization_weights = np.ones((1, self.n_history + 1, 1, 1, 1), np.float32)

        if self.history_normalization_mode != "none":
            self.quadrature = GridQuadrature(
                grid_to_quadrature_rule(params.get("model_grid_type", "equiangular")),
                img_shape=self.img_shape,
                normalize=True,
            )

        self.static_features = get_static_features(params)
        self.do_add_static_features = self.static_features is not None
        self.bias_correction = get_bias_correction(params)

        # bookkeeping for channel counting
        self.n_static_channels = 0 if self.static_features is None else self.static_features.shape[1]
        self.aux_channel_names = get_auxiliary_channels(**params.to_dict()) if hasattr(params, "to_dict") else []

        # input-noise "perturb" mode: trailing noise channels of the
        # unpredicted tensor are ADDED to selected input channels instead of
        # concatenated (ref preprocessor.py:176-179, 449-456)
        noise_params = params.get("input_noise", None) or {}
        self.input_noise_mode = noise_params.get("mode", "concatenate") if noise_params else "none"
        self.perturb_channels = None
        if self.input_noise_mode == "perturb":
            channel_names = list(params.get("channel_names", []))
            in_ch = params.get("in_channels", list(range(len(channel_names))))
            in_names = [channel_names[i] for i in in_ch]
            pch = noise_params.get("perturb_channels", in_names)
            self.perturb_channels = np.asarray([in_names.index(c) for c in pch])

    # ---- history handling -------------------------------------------------
    def flatten_history(self, x):
        if x.ndim == 5:
            b, t, c, h, w = x.shape
            return x.reshape(b, t * c, h, w)
        return x

    def expand_history(self, x, nhist):
        if x.ndim == 4:
            b, ct, h, w = x.shape
            if ct % nhist != 0:
                raise ValueError(f"channel dim {ct} not divisible by nhist {nhist}")
            return x.reshape(b, nhist, ct // nhist, h, w)
        return x

    def append_history(self, x1, x2, step):
        """Slide the history window: drop the oldest state, append prediction
        (ref preprocessor.py:341-410). x1: (B, (n_history+1)*C, H, W);
        x2: (B, C, H, W)."""
        if self.n_history == 0:
            return x2
        xh = self.expand_history(x1, self.n_history + 1)
        x2e = x2[:, None]
        xnew = jnp.concatenate([xh[:, 1:], x2e], axis=1)
        return self.flatten_history(xnew)

    # ---- channel appending ------------------------------------------------
    def append_channels(self, x, xc):
        """Append per-timestep channels (zenith) to a flattened-history input
        (ref preprocessor.py:412-464). x: (B, T*C, H, W), xc: (B, T, Cz, H, W).

        In input-noise "perturb" mode the LAST ``len(perturb_channels)``
        channels of ``xc`` are interpreted as noise and added to the selected
        input channels; any leading channels (zenith) are appended as usual."""
        if xc is None:
            return x
        if self.perturb_channels is not None:
            T = self.n_history + 1
            if xc.ndim == 4:
                xc = xc[:, None]
            Cn = len(self.perturb_channels)
            noise, xc = xc[:, :, -Cn:], xc[:, :, :-Cn]
            xe = self.expand_history(x, T)
            idx = jnp.asarray(self.perturb_channels)
            xe = xe.at[:, :, idx].add(noise.astype(xe.dtype))
            x = self.flatten_history(xe)
            if xc.shape[2] == 0:
                return x
        T = self.n_history + 1
        xe = self.expand_history(x, T)
        if xc.ndim == 4:
            xc = xc[:, None]
        out = jnp.concatenate([xe, xc.astype(xe.dtype)], axis=2)
        return self.flatten_history(out)

    def append_unpredicted_features(self, x, unpredicted=None):
        return self.append_channels(x, unpredicted)

    # ---- static features ----------------------------------------------------
    def add_static_features(self, x):
        if not self.do_add_static_features:
            return x
        static = jnp.asarray(self.static_features, dtype=x.dtype)
        # pad to the (possibly latitude-padded) input grid
        if static.shape[-2] < x.shape[-2] or static.shape[-1] < x.shape[-1]:
            static = jnp.pad(
                static,
                [(0, 0), (0, 0), (0, x.shape[-2] - static.shape[-2]), (0, x.shape[-1] - static.shape[-1])],
            )
        static = jnp.tile(static, (x.shape[0], 1, 1, 1))
        return jnp.concatenate([x, static], axis=1)

    def remove_static_features(self, x):
        if not self.do_add_static_features:
            return x
        return x[:, : x.shape[1] - self.n_static_channels]

    # ---- history normalization ---------------------------------------------
    def history_compute_stats(self, x):
        """Returns (mean, std) of shape (B, 1, C, 1, 1)-flattened; identity
        stats for mode 'none' (ref preprocessor.py:466-558)."""
        if self.history_normalization_mode == "none":
            return None
        xe = self.expand_history(x, self.n_history + 1)
        w = jnp.asarray(self.history_normalization_weights, dtype=jnp.float32)
        xf = xe.astype(jnp.float32)
        # spatial quadrature mean per (B, T, C), then weighted over T
        smean = self.quadrature(xf)  # (B, T, C)
        mean = jnp.sum(smean * w[..., 0, 0], axis=1)  # (B, C)
        svar = self.quadrature(jnp.square(xf - mean[:, None, :, None, None]))
        std = jnp.sqrt(jnp.sum(svar * w[..., 0, 0], axis=1))
        return mean[:, :, None, None], std[:, :, None, None]

    def history_normalize(self, x, stats):
        if self.history_normalization_mode == "none" or stats is None:
            return x
        mean, std = stats
        T = self.n_history + 1
        xe = self.expand_history(x, T)
        xn = (xe - mean[:, None].astype(xe.dtype)) / (std[:, None] + self.history_eps).astype(xe.dtype)
        return self.flatten_history(xn)

    def history_denormalize(self, xn, stats):
        if self.history_normalization_mode == "none" or stats is None:
            return xn
        mean, std = stats
        c = xn.shape[1]
        return xn * (std[:, :c] + self.history_eps).astype(xn.dtype) + mean[:, :c].astype(xn.dtype)

    # ---- bias correction ----------------------------------------------------
    def correct_bias(self, x):
        if self.bias_correction is None:
            return x
        return x - jnp.asarray(self.bias_correction, dtype=x.dtype)


def get_unpredicted_channels(params, with_noise: bool = True) -> int:
    """Channel count of the per-step unpredicted tensor fed to the stepper:
    zenith + concatenated noise channels, or zenith + perturb noise channels
    (the latter are consumed, not concatenated, by the preprocessor)."""
    n = 1 if params.get("add_zenith", False) else 0
    noise_cfg = params.get("input_noise", None) or {}
    if noise_cfg and with_noise:
        mode = noise_cfg.get("mode", "concatenate")
        if mode == "concatenate":
            n += noise_cfg.get("n_channels", 1)
        elif mode == "perturb":
            channel_names = list(params.get("channel_names", []))
            in_ch = params.get("in_channels", list(range(len(channel_names))))
            pch = noise_cfg.get("perturb_channels", None)
            n += len(pch) if pch is not None else len(in_ch)
    return n


def get_preprocessor(params) -> Preprocessor2D:
    return Preprocessor2D(params)
