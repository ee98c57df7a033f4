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

__all__ = ["Inferencer", "SideDataset"]


def split_list(lst, num_chunks: int):
    """Split a list into num_chunks contiguous, near-equal chunks
    (ref makani/utils/functions.py split_list semantics)."""
    chunks = []
    n = len(lst)
    base = n // num_chunks
    rem = n % num_chunks
    pos = 0
    for i in range(num_chunks):
        size = base + (1 if i < rem else 0)
        chunks.append(lst[pos : pos + size])
        pos += size
    return chunks


class SideDataset:
    """Time-indexed side fields: masks or per-date climatology
    (ref inferencer.py:114-178 mask/climatology MultifilesDataset usage).

    Reads a directory (or single file) of HDF5 files holding ``fields``
    (T, C, H, W). Lookup is by *relative* timestamp — seconds since the start
    of the year — so a one-year climatology file serves any target date.
    Channels are selected with ``out_channels``; optional bias/scale normalize
    the fields into model space (climatology) — masks stay raw.
    """

    def __init__(self, location: str, out_channels, bias=None, scale=None, dhours: int = 6):
        import glob

        import h5py

        paths = sorted(glob.glob(os.path.join(location, "*.h5"))) if os.path.isdir(location) else [location]
        if not paths:
            raise IOError(f"no side-dataset files under {location}")
        # single handle: side datasets are one file (climatology/mask)
        self._file = h5py.File(paths[0], "r")
        self._fields = self._file["fields"]
        self.n_samples = self._fields.shape[0]
        self.out_channels = np.asarray(out_channels)
        # bias/scale arrive already in out_channels row order (get_out_normalization)
        self.bias = None if bias is None else np.asarray(bias).reshape(-1, 1, 1)
        self.scale = None if scale is None else np.asarray(scale).reshape(-1, 1, 1)
        self.dhours = dhours
        if "timestamp" in self._file:
            self._rel_ts = np.asarray(self._file["timestamp"], np.int64)
            self._rel_ts = self._rel_ts - self._rel_ts[0]
        else:
            self._rel_ts = np.arange(self.n_samples, dtype=np.int64) * dhours * 3600

    def at_time(self, timestamp: float) -> np.ndarray:
        """Fields (C, H, W) at the relative time of ``timestamp`` (epoch s)."""
        year_start = (
            np.asarray(np.int64(timestamp), "datetime64[s]")
            .astype("datetime64[Y]")
            .astype("datetime64[s]")
            .astype(np.int64)
        )
        rel = np.int64(timestamp) - year_start
        idx = int(np.argmin(np.abs(self._rel_ts - rel % (self._rel_ts[-1] + self.dhours * 3600))))
        x = np.asarray(self._fields[idx], np.float32)[self.out_channels]
        if self.bias is not None and self.scale is not None:
            x = (x - self.bias) / self.scale
        return x


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

        # mask / per-date climatology side-datasets (ref inferencer.py:114-178).
        # With a climatology side-dataset, anomalies are formed per date in the
        # rollout loop and the handler's static climatology is disabled.
        self.mask_dataset = None
        if params.get("mask_file", None):
            self.mask_dataset = SideDataset(params.get("mask_file"), params.get("out_channels"), dhours=params.get("dhours", 6))
            from makani_tpu.utils.grids import GridQuadrature, grid_to_quadrature_rule

            self.mask_quadrature = GridQuadrature(
                grid_to_quadrature_rule(params.get("model_grid_type", "equiangular")),
                img_shape=(params.get("img_shape_x"), params.get("img_shape_y")),
                normalize=True,
            )
        self.climatology_dataset = None
        if params.get("climatology_file", None):
            from makani_tpu.utils.dataloaders.data_helpers import get_out_normalization

            bias, scale = get_out_normalization(params)
            self.climatology_dataset = SideDataset(
                params.get("climatology_file"), params.get("out_channels"), bias=bias, scale=scale, dhours=params.get("dhours", 6)
            )

        clim = None
        if self.climatology_dataset is None:
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
        # init batch must divide over the mesh's data axes (the distributed
        # transforms are shard_mapped with explicit specs)
        B0 = self.mesh.shape["batch"] * self.mesh.shape["ensemble"]
        dummy_inp = jnp.zeros((B0, n_in_flat, H, W), jnp.float32)
        dummy_zen = jnp.zeros((B0, params.get("n_history", 0) + 1, n_dyn, H, W), jnp.float32) if n_dyn > 0 else None
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

    def _select_indices(self):
        """GLOBAL initial-condition indices after optional date-range filtering
        (--start_date/--end_date, ref inference.py CLI).

        Every process computes the identical list. The reference splits ICs
        across "batch" ranks (inferencer.py:239-247) because each rank has its
        own communicator; under single-program SPMD every process must issue
        the same jitted steps on the same global mesh, so the parallelism over
        ICs is carried by the global batch dimension instead — score_model
        feeds each process only its rows of each global batch."""
        n = len(self.valid_dataset)
        indices = list(range(n))
        start = self.params.get("start_date", None)
        end = self.params.get("end_date", None)
        if (start or end) and hasattr(self.valid_dataset, "base_timestamp"):
            t0 = np.datetime64(start).astype("datetime64[s]").astype(np.int64) if start else -(2**62)
            t1 = np.datetime64(end).astype("datetime64[s]").astype(np.int64) if end else 2**62
            indices = [i for i in indices if t0 <= self.valid_dataset.base_timestamp(i) <= t1]
            if not indices:
                raise ValueError(f"no samples between {start} and {end}")
        n_ics = self.params.get("n_ics", None)
        if n_ics:
            indices = indices[: int(n_ics)]
        return indices

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
        # bias buffer: Welford mean/std of (pred - target), the reference's
        # bias_file output (inferencer.py:697-701)
        self.bias_buffer = TemporalAverageBuffer(S, n_out, (H, W))
        self.spectrum_buffer = SpectrumAverageBuffer((H, W), S, n_out, params.get("model_grid_type", "equiangular"))
        self.zonal_buffer = ZonalSpectrumAverageBuffer((H, W), S, n_out)

        E = self.ensemble_size
        indices = list(self._select_indices())
        bs = params.get("batch_size", 1)
        n_ic = len(indices)

        # pad the IC list to whole batches (the reference pads/trims rank
        # ranges, ref inferencer.py:239-247); pad rows repeat the last IC and
        # are masked out of metrics and streaming buffers — every jitted step
        # then runs at one static shape (no last-batch recompile, and all
        # processes execute identical SPMD programs)
        n_pad = (-n_ic) % bs
        if n_pad:
            indices = indices + [indices[-1]] * n_pad

        # multi-process: every process walks the SAME global batches (identical
        # jitted steps / collectives), loading only its own rows. Ensemble
        # members fold into the sample dim (b-major, as EnsembleTrainer does),
        # so the ensemble mesh axis may span processes (the reference's
        # 256-GPU ensemble+model+data-parallel scoring, ref README.md:62-68).
        nproc = jax.process_count()
        row_slice = None  # E == 1: local slice of the bs global rows
        folded_rows = None  # E > 1: global folded (bs*E) rows owned locally
        tar_slice = None  # E > 1: local slice of tar's bs rows under P("batch")
        if nproc > 1:
            from makani_tpu.parallel import multihost

            n_shards = self.mesh.shape["batch"] * self.mesh.shape["ensemble"]
            if E > 1:
                if (bs * E) % n_shards != 0 or bs % self.mesh.shape["batch"] != 0:
                    raise ValueError(
                        f"multi-process ensemble score_model needs the folded batch ({bs}*{E}) divisible "
                        f"by the data shards ({n_shards}) and batch_size ({bs}) divisible by the batch "
                        f"mesh axis ({self.mesh.shape['batch']})"
                    )
                fs = multihost.local_batch_slice(self.mesh, bs * E)
                folded_rows = np.arange(fs.start, fs.stop)
                tar_slice = multihost.local_batch_slice(self.mesh, bs, axes=("batch",))
            else:
                if bs % n_shards != 0:
                    raise ValueError(
                        f"multi-process score_model needs batch_size ({bs}) divisible by the data "
                        f"shards ({n_shards})"
                    )
                row_slice = multihost.local_batch_slice(self.mesh, bs)

        index_batches = [indices[i : i + bs] for i in range(0, len(indices), bs)]
        from makani_tpu.utils.dataloader import _assemble

        has_ts = hasattr(self.valid_dataset, "target_timestamps")
        ic_index = 0
        for batch_idx in index_batches:
            from makani_tpu.utils.functions import expand_ensemble, fold_ensemble

            is_last = ic_index == len(index_batches) - 1
            n_valid = bs - n_pad if (is_last and n_pad) else bs
            # per-lead-time target timestamps for mask/climatology lookup
            tar_ts = [self.valid_dataset.target_timestamps(int(i)) for i in batch_idx] if has_ts else None

            # global folded noise sequence for the whole (bs*E) batch —
            # identical on every process (same key), sliced to local rows
            # below, so multi-process results match single-process exactly
            seq = None
            if E > 1 and self.noise is not None:
                self._noise_key, sub = jax.random.split(self._noise_key)
                total_steps = n_hist + S
                draw = (bs * E) // 2 if self.centered else bs * E
                keys = jax.random.split(sub, total_steps + 1)
                state = self.noise.init_state(keys[0], draw)
                fields = [self.noise.sample(state)[:, 0]]
                for t in range(1, total_steps):
                    state = self.noise.update(state, keys[t], replace_state=False)
                    fields.append(self.noise.sample(state)[:, 0])
                seq = jnp.stack(fields, axis=1)
                if self.centered:
                    seq = jnp.stack([seq, -seq], axis=1).reshape(draw * 2, *seq.shape[1:])

            if folded_rows is not None:
                # E > 1 multi-process: members fold b-major into the sample
                # dim (fold_ensemble layout); this process reads only the
                # unfolded rows backing its folded copies plus its tar rows
                # (tar is sharded over "batch" alone — each batch row exists
                # once, while its members may span processes)
                from makani_tpu.parallel import multihost

                brows = folded_rows // E
                need_in = sorted(set(int(b) for b in brows))
                need_tar = list(range(tar_slice.start, tar_slice.stop))
                samples = {b: self.valid_dataset[int(batch_idx[b])] for b in sorted(set(need_in) | set(need_tar))}
                bin_ = _assemble([samples[b] for b in need_in])
                pos = {b: i for i, b in enumerate(need_in)}
                sel = np.array([pos[int(b)] for b in brows])
                inp_l = np.asarray(bin_["inp"])[sel]
                zen_l = np.asarray(bin_["zen"])[sel] if "zen" in bin_ else None
                if seq is not None:
                    seq_l = np.asarray(seq)[folded_rows]
                    zen_l = np.concatenate([zen_l, seq_l], axis=2) if zen_l is not None else seq_l
                tar_l = np.asarray(_assemble([samples[b] for b in need_tar])["tar"])

                inp = multihost.make_global_array(inp_l, self.mesh, self.data_sharding.spec, (bs * E, *inp_l.shape[1:]))
                tar = multihost.make_global_array(tar_l, self.mesh, P("batch", None, "h", "w"), (bs, *tar_l.shape[1:]))
                zen = None
                if zen_l is not None:
                    zspec = P(("batch", "ensemble"), None, None, "h", "w")
                    zen = multihost.make_global_array(zen_l, self.mesh, zspec, (bs * E, *zen_l.shape[1:]))
            else:
                local_idx = batch_idx if row_slice is None else batch_idx[row_slice]
                batch = _assemble([self.valid_dataset[int(i)] for i in local_idx])
                inp = jnp.asarray(batch["inp"])
                tar = jnp.asarray(batch["tar"])
                zen = jnp.asarray(batch["zen"]) if "zen" in batch else None
                if E > 1:
                    inp = expand_ensemble(inp, E)
                    zen = expand_ensemble(zen, E) if zen is not None else None
                    if seq is not None:
                        zen = jnp.concatenate([zen, seq], axis=2) if zen is not None else seq
                if row_slice is not None:
                    # assemble globals from this process's rows (tar/zen too:
                    # the jitted step and the metrics consume global arrays)
                    from makani_tpu.parallel import multihost

                    inp = multihost.make_global_array(np.asarray(inp), self.mesh, self.data_sharding.spec, (bs, *inp.shape[1:]))
                    tar = multihost.make_global_array(np.asarray(tar), self.mesh, self.data_sharding.spec, (bs, *tar.shape[1:]))
                    if zen is not None:
                        zspec = P(("batch", "ensemble"), None, None, "h", "w")
                        zen = multihost.make_global_array(np.asarray(zen), self.mesh, zspec, (bs, *zen.shape[1:]))
                else:
                    n_shards = self.mesh.shape["batch"] * self.mesh.shape["ensemble"]
                    sharding = self.data_sharding if inp.shape[0] % n_shards == 0 else NamedSharding(self.mesh, P(None, None, "h", "w"))
                    inp = jax.device_put(inp, sharding)

            # mask for batch-padding rows (metrics ignore them; buffers are
            # sliced on the host below)
            row_weights = None
            if n_valid < bs:
                row_weights = jnp.asarray((np.arange(bs) < n_valid).astype(np.float32))

            inpt = inp
            for step in range(S):
                zwin = None if zen is None else zen[:, step : step + T]
                pred = self._eval_step(self.model_params, inpt, zwin)
                pred_scored = fold_ensemble(pred, E) if E > 1 else pred
                tstep = tar[:, step * n_out : (step + 1) * n_out]

                # per-date side fields at this lead time
                mask = clims = None
                if tar_ts is not None and (self.mask_dataset is not None or self.climatology_dataset is not None):
                    ts_step = [row[step] for row in tar_ts]
                    if self.mask_dataset is not None:
                        m = np.stack([self.mask_dataset.at_time(t) for t in ts_step])
                        m = jnp.asarray(m)
                        # normalize masks to unit quadrature integral (ref :602-605)
                        mnorm = self.mask_quadrature(m)[..., None, None]
                        mask = m / jnp.maximum(mnorm, 1e-12)
                    if self.climatology_dataset is not None:
                        clims = jnp.asarray(np.stack([self.climatology_dataset.at_time(t) for t in ts_step]))

                # subtract per-date climatology before scoring (anomaly metrics)
                if clims is not None:
                    predc = pred_scored - (clims[:, None] if pred_scored.ndim == 5 else clims)
                    tstepc = tstep - clims
                else:
                    predc, tstepc = pred_scored, tstep
                self.metrics.update(predc, tstepc, step, mask=mask, row_weights=row_weights)

                pred_mean = jnp.mean(pred_scored, axis=1) if E > 1 else pred
                if row_slice is not None or folded_rows is not None:
                    # the streaming buffers consume host arrays: gather the
                    # global rows to every process (the reference likewise
                    # gathers from spatial ranks before writing,
                    # rollout_buffer.py:581-668)
                    from makani_tpu.parallel import multihost

                    pred_mean = jnp.asarray(multihost.fetch_replicated(pred_mean))
                    tstep_h = jnp.asarray(multihost.fetch_replicated(tstep))
                else:
                    tstep_h = tstep
                # drop batch-padding rows before the streaming accumulators
                pm_v, ts_v = pred_mean[:n_valid], tstep_h[:n_valid]
                self.temporal_buffer.update(pm_v, step)
                self.bias_buffer.update(pm_v - ts_v, step)
                self.spectrum_buffer.update(pm_v, step, tar=ts_v)
                self.zonal_buffer.update(pm_v, step, tar=ts_v)
                if hasattr(self, "rollout_buffer"):
                    self.rollout_buffer.update(pm_v, step, ic_index)
                if step < S - 1:
                    inpt = self.preprocessor.append_history(inpt, pred, step)
            ic_index += 1

        logs = self.metrics.finalize(reduce_over_processes=True)
        if output_dir:
            self.metrics.save(os.path.join(output_dir, "metrics.h5"))
            import h5py

            mean, std = self.temporal_buffer.finalize()
            bias_mean, bias_std = self.bias_buffer.finalize()
            with h5py.File(os.path.join(output_dir, "temporal_averages.h5"), "w") as f:
                f.create_dataset("mean", data=mean)
                f.create_dataset("std", data=std)
                f.create_dataset("bias_mean", data=bias_mean)
                f.create_dataset("bias_std", data=bias_std)
            sh_prd, sh_tar = self.spectrum_buffer.finalize()
            zn_prd, zn_tar = self.zonal_buffer.finalize()
            with h5py.File(os.path.join(output_dir, "spectra.h5"), "w") as f:
                f.create_dataset("sh_spectrum", data=sh_prd)
                f.create_dataset("sh_spectrum_target", data=sh_tar)
                f.create_dataset("zonal_spectrum", data=zn_prd)
                f.create_dataset("zonal_spectrum_target", data=zn_tar)
            if hasattr(self, "rollout_buffer"):
                self.rollout_buffer.finalize()
        return logs

    def log_score(self, logs: dict):
        for k in sorted(logs):
            if "/" not in k:
                logger.info(f"{k}: {logs[k]:.5f}")
        return logs
