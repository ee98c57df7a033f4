"""Online validation metrics handler (ref makani/utils/metric.py:45-746).

Tracks per-(rollout-step, channel) rollout curves of the configured metrics
(L1 / RMSE / ACC vs climatology, plus CRPS/spread/SSR for ensembles) across
validation batches. The device side is one jitted function per input shape
that reduces each metric over the (sharded, possibly multi-host) batch on
device; the host only ever touches replicated (C,)-sized sums, so
accumulation is multi-process-safe — replacing the reference's CUDA-stream
Welford machinery (which jit + GSPMD make unnecessary).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from makani_tpu.utils.grids import GridQuadrature, grid_to_quadrature_rule
from makani_tpu.utils.metrics.functions import (
    ensemble_crps,
    ensemble_rank_histogram,
    ensemble_spread,
    weighted_acc,
    weighted_l1,
    weighted_rmse,
)

__all__ = ["MetricsHandler"]


class MetricsHandler:
    def __init__(self, params, climatology: Optional[np.ndarray] = None, num_rollout_steps: Optional[int] = None):
        self.img_shape = (params.get("img_shape_x"), params.get("img_shape_y"))
        self.channel_names = list(params.get("channel_names"))
        self.num_rollout_steps = num_rollout_steps or (params.get("valid_autoreg_steps", 0) + 1)

        grid_type = params.get("model_grid_type", "equiangular")
        if params.get("metrics_use_wb2_grid", False):
            quad_rule = "weatherbench2"
        else:
            quad_rule = grid_to_quadrature_rule(grid_type)
        self.quadrature = GridQuadrature(quad_rule, img_shape=self.img_shape, normalize=True)

        self.climatology = climatology
        self.metric_names = list(params.get("metric_names", ["rmse", "acc", "l1"]))
        # device-side batch reduction: sum over the batch on device so the host
        # only reads replicated (C,) sums (multi-host-safe; the per-batch (B, C)
        # intermediates may be sharded over processes)
        self._jit_batch_sums = jax.jit(self._batch_sums)
        self.reset()

    def reset(self):
        S = self.num_rollout_steps
        # sums are allocated lazily on the first update: some metrics carry
        # extra trailing axes (rank histogram: E+1 bins)
        self._sums = {}
        self._counts = np.zeros((S,), np.int64)

    def compute_batch(self, prd, tar, mask=None):
        """Device-side per-batch metrics: prd/tar (B, C, H, W) or (B, E, C, H, W)
        -> dict of (B, C) arrays. jit-friendly. ``mask`` is an optional
        quadrature-normalized spatial weight (B, C, H, W) — the reference's
        mask side-dataset path (inferencer.py:596-605)."""
        out = {}
        quad = self.quadrature
        if prd.ndim == 5:
            prdm = jnp.mean(prd, axis=1)
        else:
            prdm = prd
        clim = None if self.climatology is None else jnp.asarray(self.climatology)
        for m in self.metric_names:
            if m == "rmse":
                out[m] = weighted_rmse(prdm, tar, quad, mask=mask)
            elif m == "l1":
                out[m] = weighted_l1(prdm, tar, quad, mask=mask)
            elif m == "acc":
                out[m] = weighted_acc(prdm, tar, quad, clim=clim, mask=mask)
            elif m == "crps" and prd.ndim == 5:
                out[m] = ensemble_crps(prd, tar, quad, mask=mask)
            elif m == "spread" and prd.ndim == 5:
                out[m] = ensemble_spread(prd, quad, mask=mask)
            elif m == "ssr" and prd.ndim == 5:
                spread = ensemble_spread(prd, quad, mask=mask)
                rmse = weighted_rmse(prdm, tar, quad, mask=mask)
                out[m] = spread / (rmse + 1e-8)
            elif m == "rankhist" and prd.ndim == 5:
                out[m] = ensemble_rank_histogram(prd, tar, quad)
        return out

    def _batch_sums(self, prd, tar, mask=None, row_weights=None):
        """Jitted: per-batch metrics summed over the batch dim -> ((C,)-dict, n).

        ``row_weights`` (B,) down-weights rows (0.0 excludes batch-padding
        rows added to keep SPMD shapes static; the count n shrinks to match).
        """
        vals = self.compute_batch(prd, tar, mask=mask)
        if row_weights is None:
            return {m: jnp.sum(v, axis=0) for m, v in vals.items()}, prd.shape[0]
        w = row_weights.astype(jnp.float32)
        sums = {m: jnp.sum(v * w.reshape((-1,) + (1,) * (v.ndim - 1)), axis=0) for m, v in vals.items()}
        return sums, jnp.sum(w)

    def update(self, prd, tar, step: int, mask=None, row_weights=None):
        """Accumulate one validation batch at rollout step ``step``.

        The reduction over the batch runs on device inside jit, so only
        replicated per-channel sums reach the host — safe when ``prd``/``tar``
        are global arrays sharded across processes.
        """
        sums, n = self._jit_batch_sums(prd, tar, mask, row_weights)
        for m, v in sums.items():
            v = np.asarray(jax.device_get(v))
            if m not in self._sums:
                self._sums[m] = np.zeros((self.num_rollout_steps, *v.shape), np.float64)
            self._sums[m][step] += v
        self._counts[step] += int(n)

    def finalize(self, reduce_over_processes: bool = False) -> dict:
        """Averaged rollout curves plus scalar summaries.

        Logs the full per-step rollout curve of each metric (channel-mean), the
        per-channel values at step 0 and at the final step — mirroring the
        reference's full rollout-curve logging (makani/utils/metric.py:651-746);
        channel-resolved full curves go to ``save()``.

        ``reduce_over_processes``: sum the accumulators across jax processes —
        used when initial conditions are split across hosts (the reference's
        batch-rank split, inferencer.py:239-247).
        """
        import jax

        if reduce_over_processes and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            gathered_counts = np.asarray(multihost_utils.process_allgather(jnp.asarray(self._counts)))
            self._counts = gathered_counts.sum(axis=0)
            for m in list(self._sums):
                # fp32 on the wire (jax x64 is off); the (S, C) sums are small
                g = np.asarray(multihost_utils.process_allgather(jnp.asarray(self._sums[m], jnp.float32)))
                self._sums[m] = g.sum(axis=0).astype(np.float64)

        logs = {}
        counts = np.maximum(self._counts, 1)
        self.rollout_curves = {
            m: s / counts.reshape((-1,) + (1,) * (s.ndim - 1)) for m, s in self._sums.items()
        }
        for m, curve in self.rollout_curves.items():
            if m == "rankhist":
                # scalar summary: rms deviation of the histogram from flat
                # (0 = calibrated); the full (S, C, E+1) curve is in save()
                nbins = curve.shape[-1]
                dev = np.sqrt(np.mean(np.square(curve * nbins - 1.0), axis=(-2, -1)))
                logs["rankhist_rmsd"] = float(dev[0])
                continue
            logs[f"{m}"] = float(curve[0].mean())
            for s in range(curve.shape[0]):
                logs[f"{m}_rollout/{s}"] = float(curve[s].mean())
            for c, name in enumerate(self.channel_names):
                logs[f"{m}/{name}"] = float(curve[0, c])
                if curve.shape[0] > 1:
                    logs[f"{m}_final/{name}"] = float(curve[-1, c])
            if curve.shape[0] > 1:
                logs[f"{m}_rollout_last"] = float(curve[-1].mean())
        return logs

    def save(self, path: str):
        import h5py

        with h5py.File(path, "w") as f:
            for m, curve in self.rollout_curves.items():
                f.create_dataset(m, data=curve)
            f.create_dataset("channel", data=np.array(self.channel_names, dtype="S"))
