"""Rollout-based inference and scoring (ref makani/utils/inference/
inferencer.py:60-882).

Loads a trained model (best/latest checkpoint), iterates over initial
conditions from the validation/inference dataset, rolls the model out
autoregressively and scores every lead time with the MetricsHandler; optional
streaming output buffers write raw forecasts, temporal means/stds and
spectra. Initial conditions are embarrassingly parallel and sharded over the
mesh's batch axes.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.models.model_registry import get_model
from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.checkpoint_helpers import CheckpointManager
from makani_tpu.utils.dataloader import get_dataloader
from makani_tpu.utils.dataloaders.data_helpers import get_climatology
from makani_tpu.utils.inference.rollout_buffer import (
    RolloutBuffer,
    SpectrumAverageBuffer,
    TemporalAverageBuffer,
    ZonalSpectrumAverageBuffer,
)
from makani_tpu.utils.loss import LossHandler
from makani_tpu.utils.metric import MetricsHandler

logger = logging.getLogger(__name__)

__all__ = ["Inferencer"]


class Inferencer:
    def __init__(self, params, world_rank: int = 0):
        self.params = params
        self.world_rank = world_rank

        self.mesh = pmesh.init(
            h=params.get("h_parallel_size", 1),
            w=params.get("w_parallel_size", 1),
            matmul=params.get("parameters_split_size", 1),
            ensemble=params.get("ensemble_parallel_size", 1),
        )

        self.valid_loader, self.valid_dataset = get_dataloader(
            params, params.get("inf_data_path", params.get("valid_data_path", "")), mode="eval", final_eval=True
        )

        self.model, self.preprocessor = get_model(params, multistep=True)
        self.n_out = len(params.get("out_channels"))

        # ensemble inference (HENS-style, ref inferencer + ensemble.py): expand
        # each initial condition into E members perturbed by the configured noise
        self.ensemble_size = params.get("ensemble_size", 1)
        self.noise = None
        if self.ensemble_size > 1 and params.get("input_noise", None):
            from makani_tpu.models.noise import build_noise

            noise_params = params.get("input_noise")
            self.centered = noise_params.get("centered", False)
            self.noise_mode = noise_params.get("mode", "concatenate")
            noise_cfg = dict(noise_params, grid_type=params.get("model_grid_type", "equiangular"))
            if self.noise_mode == "perturb":
                noise_cfg["n_channels"] = len(self.preprocessor.perturb_channels)
            self.noise = build_noise(
                noise_cfg,
                (params.get("img_shape_x"), params.get("img_shape_y")),
                num_time_steps=1,
            )
            self._noise_key = jax.random.PRNGKey(params.get("seed", 333) + 99)

        clim = None
        try:
            clim = get_climatology(params)
        except Exception:
            clim = None
        self.metrics = MetricsHandler(params, climatology=clim)
        self.loss_obj = LossHandler(params)

        # initialize and restore parameters
        H, W = params.get("img_shape_x"), params.get("img_shape_y")
        n_in_flat = (params.get("n_history", 0) + 1) * len(params.get("in_channels"))
        from makani_tpu.models.preprocessor import get_unpredicted_channels

        n_dyn = get_unpredicted_channels(params, with_noise=self.ensemble_size > 1)
        dummy_inp = jnp.zeros((1, n_in_flat, H, W), jnp.float32)
        dummy_zen = jnp.zeros((1, params.get("n_history", 0) + 1, n_dyn, H, W), jnp.float32) if n_dyn > 0 else None
        self.model_params = self.model.init(jax.random.PRNGKey(0), dummy_inp, dummy_zen)

        ckpt = CheckpointManager(params)
        restored = ckpt.restore_best(self.model_params)
        if restored is not None:
            self.model_params = restored[0]
        elif params.get("checkpoint_required", True) and os.path.isdir(ckpt.checkpoint_dir):
            logger.warning("no checkpoint found in %s; using random init", ckpt.checkpoint_dir)

        self.data_sharding = NamedSharding(self.mesh, P(("batch", "ensemble"), None, "h", "w"))
        self.param_sharding = NamedSharding(self.mesh, P())
        self.model_params = jax.device_put(self.model_params, self.param_sharding)

        @jax.jit
        def eval_step(p, inp, zen):
            return self.model.apply(p, inp, zen, train=False)

        self._eval_step = eval_step

    def score_model(self, output_dir: Optional[str] = None):
        """Roll out over all initial conditions and score every lead time
        (ref inferencer.py:218-520). Returns the metrics log dict."""
        params = self.params
        S = params.get("valid_autoreg_steps", 0) + 1
        n_hist = params.get("n_history", 0)
        T = n_hist + 1
        n_out = self.n_out
        H, W = params.get("img_shape_x"), params.get("img_shape_y")

        self.metrics.reset()

        buffers = []
        if output_dir is not None:
            os.makedirs(output_dir, exist_ok=True)
        if params.get("save_raw_forecasts", False) and output_dir:
            self.rollout_buffer = RolloutBuffer(
                params.get("channel_names"),
                params.get("output_channels", None),
                (H, W),
                S,
                path=os.path.join(output_dir, "raw_forecasts.h5"),
            )
            buffers.append(self.rollout_buffer)
        self.temporal_buffer = TemporalAverageBuffer(S, n_out, (H, W))
        self.spectrum_buffer = SpectrumAverageBuffer((H, W), S, n_out, params.get("model_grid_type", "equiangular"))
        self.zonal_buffer = ZonalSpectrumAverageBuffer((H, W), S, n_out)

        E = self.ensemble_size
        ic_index = 0
        for batch in self.valid_loader:
            inp = jnp.asarray(batch["inp"])
            tar = jnp.asarray(batch["tar"])
            zen = jnp.asarray(batch["zen"]) if "zen" in batch else None
            if E > 1:
                from makani_tpu.utils.functions import expand_ensemble, fold_ensemble

                inp = expand_ensemble(inp, E)
                zen = expand_ensemble(zen, E) if zen is not None else None
                if self.noise is not None:
                    self._noise_key, sub = jax.random.split(self._noise_key)
                    total_steps = n_hist + S
                    draw = inp.shape[0] // 2 if self.centered else inp.shape[0]
                    keys = jax.random.split(sub, total_steps + 1)
                    state = self.noise.init_state(keys[0], draw)
                    fields = [self.noise.sample(state)[:, 0]]
                    for t in range(1, total_steps):
                        state = self.noise.update(state, keys[t], replace_state=False)
                        fields.append(self.noise.sample(state)[:, 0])
                    seq = jnp.stack(fields, axis=1)
                    if self.centered:
                        seq = jnp.stack([seq, -seq], axis=1).reshape(draw * 2, *seq.shape[1:])
                    zen = jnp.concatenate([zen, seq], axis=2) if zen is not None else seq
            inp = jax.device_put(inp, self.data_sharding)

            inpt = inp
            for step in range(S):
                zwin = None if zen is None else zen[:, step : step + T]
                pred = self._eval_step(self.model_params, inpt, zwin)
                if E > 1:
                    from makani_tpu.utils.functions import fold_ensemble

                    pred_scored = fold_ensemble(pred, E)
                else:
                    pred_scored = pred
                tstep = tar[:, step * n_out : (step + 1) * n_out]
                self.metrics.update(pred_scored, tstep, step)
                pred_mean = jnp.mean(pred_scored, axis=1) if E > 1 else pred
                self.temporal_buffer.update(pred_mean, step)
                self.spectrum_buffer.update(pred_mean, step)
                self.zonal_buffer.update(pred_mean, step)
                if hasattr(self, "rollout_buffer"):
                    self.rollout_buffer.update(pred_mean, step, ic_index)
                if step < S - 1:
                    inpt = self.preprocessor.append_history(inpt, pred, step)
            ic_index += 1

        logs = self.metrics.finalize()
        if output_dir:
            self.metrics.save(os.path.join(output_dir, "metrics.h5"))
            import h5py

            mean, std = self.temporal_buffer.finalize()
            with h5py.File(os.path.join(output_dir, "temporal_averages.h5"), "w") as f:
                f.create_dataset("mean", data=mean)
                f.create_dataset("std", data=std)
            with h5py.File(os.path.join(output_dir, "spectra.h5"), "w") as f:
                f.create_dataset("sh_spectrum", data=self.spectrum_buffer.finalize())
                f.create_dataset("zonal_spectrum", data=self.zonal_buffer.finalize())
            if hasattr(self, "rollout_buffer"):
                self.rollout_buffer.finalize()
        return logs

    def log_score(self, logs: dict):
        for k in sorted(logs):
            if "/" not in k:
                logger.info(f"{k}: {logs[k]:.5f}")
        return logs
