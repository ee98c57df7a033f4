"""Streaming rollout analysis buffers (ref makani/utils/inference/
rollout_buffer.py:52-1425).

Online writers consumed by the Inferencer during autoregressive rollouts:

  * ``RolloutBuffer`` — stores selected channels of every rollout step and
    writes chunked HDF5 (one dataset ``fields`` of shape
    (n_ic, n_steps, C_sel, H, W)).
  * ``TemporalAverageBuffer`` — Welford online mean/std maps per lead time.
  * ``SpectrumAverageBuffer`` — mean SH power spectra of prediction vs target
    per lead time.
  * ``ZonalSpectrumAverageBuffer`` — mean zonal (longitudinal FFT) spectra.

Device work is a pure reduction returning small arrays; accumulation and IO
happen on the host (the reference gathers from spatial ranks and uses
O_DIRECT writes — under SPMD a global-array fetch does the gather).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax.numpy as jnp

from makani_tpu.ops.sht import RealSHT
from makani_tpu.ops import fft_compat

__all__ = ["RolloutBuffer", "TemporalAverageBuffer", "SpectrumAverageBuffer", "ZonalSpectrumAverageBuffer"]


class RolloutBuffer:
    """Collect selected output channels per rollout step and write HDF5."""

    def __init__(self, channel_names: Sequence[str], output_channels: Optional[Sequence[str]], img_shape, num_steps: int, path: Optional[str] = None):
        self.channel_names = list(channel_names)
        out = output_channels if output_channels else self.channel_names
        self.out_names = list(out)
        self.out_idx = np.asarray([self.channel_names.index(c) for c in self.out_names])
        self.img_shape = tuple(img_shape)
        self.num_steps = num_steps
        self.path = path
        self._file = None
        self._n_ic = 0

    def _ensure_file(self, batch):
        if self.path is None or self._file is not None:
            return
        import h5py

        self._file = h5py.File(self.path, "w")
        self._ds = self._file.create_dataset(
            "fields",
            shape=(0, self.num_steps, len(self.out_names), *self.img_shape),
            maxshape=(None, self.num_steps, len(self.out_names), *self.img_shape),
            chunks=(1, 1, len(self.out_names), *self.img_shape),
            dtype="f4",
        )
        self._file.create_dataset("channel", data=np.array(self.out_names, dtype="S"))
        self._pending = {}

    def update(self, pred, idt: int, ic_index: int = 0):
        """pred: (B, C, H, W) device array at lead-time index ``idt``."""
        sel = np.asarray(pred)[:, self.out_idx, : self.img_shape[0], : self.img_shape[1]]
        if self.path is None:
            self._pending = getattr(self, "_pending", {})
        self._ensure_file(sel)
        key = ic_index
        self._pending.setdefault(key, np.zeros((sel.shape[0], self.num_steps, len(self.out_names), *self.img_shape), np.float32))
        self._pending[key][:, idt] = sel
        if idt == self.num_steps - 1 and self._file is not None:
            block = self._pending.pop(key)
            n0 = self._ds.shape[0]
            self._ds.resize(n0 + block.shape[0], axis=0)
            self._ds[n0:] = block
            self._n_ic += block.shape[0]

    def finalize(self):
        if self._file is not None:
            self._file.close()
            self._file = None


class TemporalAverageBuffer:
    """Welford online mean/std of prediction and error maps per lead time."""

    def __init__(self, num_steps: int, num_channels: int, img_shape):
        shape = (num_steps, num_channels, *img_shape)
        self.count = np.zeros(num_steps, np.int64)
        self.mean = np.zeros(shape, np.float64)
        self.m2 = np.zeros(shape, np.float64)

    def update(self, pred, idt: int):
        x = np.asarray(pred, np.float64)
        for b in range(x.shape[0]):
            self.count[idt] += 1
            delta = x[b, :, : self.mean.shape[-2], : self.mean.shape[-1]] - self.mean[idt]
            self.mean[idt] += delta / self.count[idt]
            delta2 = x[b, :, : self.mean.shape[-2], : self.mean.shape[-1]] - self.mean[idt]
            self.m2[idt] += delta * delta2

    def finalize(self):
        var = self.m2 / np.maximum(self.count[:, None, None, None] - 1, 1)
        return self.mean.astype(np.float32), np.sqrt(var).astype(np.float32)


class SpectrumAverageBuffer:
    """Mean SH power spectrum per (lead time, channel, degree l) of the
    prediction AND the target (the reference compares both,
    rollout_buffer.py:919-1100)."""

    def __init__(self, img_shape, num_steps: int, num_channels: int, grid_type: str = "equiangular"):
        self.sht = RealSHT(img_shape[0], img_shape[1], grid=grid_type)
        mw = np.full((self.sht.mmax,), 2.0, np.float32)
        mw[0] = 1.0
        self._mode_weights = mw
        self.sum = np.zeros((num_steps, num_channels, self.sht.lmax), np.float64)
        self.sum_tar = np.zeros((num_steps, num_channels, self.sht.lmax), np.float64)
        self.count = np.zeros(num_steps, np.int64)
        self.img_shape = tuple(img_shape)

    def _spectrum(self, x):
        c2 = self.sht.analysis(jnp.asarray(x[..., : self.img_shape[0], : self.img_shape[1]], jnp.float32))
        power = (jnp.square(c2[..., 0]) + jnp.square(c2[..., 1])) * jnp.asarray(self._mode_weights)
        return np.asarray(jnp.sum(power, axis=-1))  # (B, C, L)

    def update(self, pred, idt: int, tar=None):
        spec = self._spectrum(pred)
        self.sum[idt] += spec.sum(axis=0)
        self.count[idt] += spec.shape[0]
        if tar is not None:
            self.sum_tar[idt] += self._spectrum(tar).sum(axis=0)

    def finalize(self):
        """Returns (pred_spectrum, target_spectrum), each (S, C, L)."""
        c = np.maximum(self.count[:, None, None], 1)
        return (self.sum / c).astype(np.float32), (self.sum_tar / c).astype(np.float32)


class ZonalSpectrumAverageBuffer:
    """Mean zonal (per-latitude longitudinal FFT) power spectrum of prediction
    and target."""

    def __init__(self, img_shape, num_steps: int, num_channels: int):
        self.img_shape = tuple(img_shape)
        nlon = img_shape[1]
        self.sum = np.zeros((num_steps, num_channels, nlon // 2 + 1), np.float64)
        self.sum_tar = np.zeros((num_steps, num_channels, nlon // 2 + 1), np.float64)
        self.count = np.zeros(num_steps, np.int64)

    def _spectrum(self, x):
        xj = jnp.asarray(np.asarray(x)[..., : self.img_shape[0], : self.img_shape[1]], jnp.float32)
        f2 = fft_compat.rfft_s(xj, axis=-1, norm="forward")
        power = jnp.square(f2[..., 0]) + jnp.square(f2[..., 1])
        return np.asarray(jnp.mean(power, axis=-2))  # average over latitude: (B, C, M)

    def update(self, pred, idt: int, tar=None):
        spec = self._spectrum(pred)
        self.sum[idt] += spec.sum(axis=0)
        self.count[idt] += spec.shape[0]
        if tar is not None:
            self.sum_tar[idt] += self._spectrum(tar).sum(axis=0)

    def finalize(self):
        """Returns (pred_spectrum, target_spectrum), each (S, C, M)."""
        c = np.maximum(self.count[:, None, None], 1)
        return (self.sum / c).astype(np.float32), (self.sum_tar / c).astype(np.float32)
