"""Deterministic trainer (ref makani/utils/training/deterministic_trainer.py:
60-789).

One jit-compiled train step over the device mesh replaces the reference's
DDP + autocast + GradScaler + comm-hook machinery: parameters live replicated
(or TP-sharded) on the mesh, batches arrive sharded over
(batch, ensemble) x (h, w), and pjit inserts every gradient reduction from
the sharding specs. bf16 compute is a model dtype, not an autocast context;
there is no GradScaler because bf16 needs none.

Per epoch: train over the loader, validate with an autoregressive rollout of
``valid_autoreg_steps`` (ref :636), track the best checkpoint, rotate saved
checkpoints (orbax).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.models.model_registry import get_model
from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.dataloader import get_dataloader
from makani_tpu.utils.dataloaders.data_helpers import get_climatology
from makani_tpu.utils.loss import LossHandler
from makani_tpu.utils.metric import MetricsHandler
from makani_tpu.utils.training.optimizer import get_optimizer
from makani_tpu.utils.checkpoint_helpers import CheckpointManager

logger = logging.getLogger(__name__)

__all__ = ["Trainer"]


class Trainer:
    def __init__(self, params, world_rank: int = 0):
        self.params = params
        self.world_rank = world_rank

        # mesh from the configured parallelism (ref train.py:64-70)
        self.mesh = pmesh.init(
            h=params.get("h_parallel_size", 1),
            w=params.get("w_parallel_size", 1),
            matmul=params.get("parameters_split_size", params.get("matmul_parallel_size", 1)),
            ensemble=params.get("ensemble_parallel_size", 1),
        )

        # dataloaders (multi-host: per-process batch rows + (h, w) IO tiles)
        self.train_loader, self.train_dataset = get_dataloader(params, params.get("train_data_path", ""), mode="train", mesh=self.mesh)
        self.valid_loader, self.valid_dataset = get_dataloader(params, params.get("valid_data_path", ""), mode="eval", mesh=self.mesh)

        # model (+ multistep wrapper when n_future > 0; ref get_model multistep flag)
        self.multistep = params.get("n_future", 0) > 0
        self.model, self.preprocessor = get_model(params, multistep=True)
        self.n_future = params.get("n_future", 0)

        # loss and metrics
        self.loss_obj = LossHandler(params)
        clim = None
        try:
            clim = get_climatology(params)
        except Exception:
            clim = None
        self.metrics = MetricsHandler(params, climatology=clim)

        # initialize parameters
        H, W = params.get("img_shape_x"), params.get("img_shape_y")
        n_in_flat = (params.get("n_history", 0) + 1) * len(params.get("in_channels"))
        zen_len = params.get("n_history", 0) + 1 + self.n_future
        # dynamic per-step channels: zenith plus noise channels (concatenated,
        # or consumed in place by the preprocessor in "perturb" mode)
        from makani_tpu.models.preprocessor import get_unpredicted_channels

        n_dyn = get_unpredicted_channels(params)
        # init batch must be shardable over the mesh's data axes
        b0 = self.mesh.shape["batch"] * self.mesh.shape["ensemble"]
        dummy_inp = jnp.zeros((b0, n_in_flat, H, W), jnp.float32)
        dummy_zen = jnp.zeros((b0, zen_len, n_dyn, H, W), jnp.float32) if n_dyn > 0 else None

        init_rng = jax.random.PRNGKey(params.get("seed", 333))
        self.model_params = self.model.init(init_rng, dummy_inp, dummy_zen)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.model_params))
        if world_rank == 0:
            logger.info(f"model has {n_params} parameters")
        self.n_model_params = n_params

        # optimizer
        steps_per_epoch = max(1, len(self.train_loader))
        self.tx, self.schedule = get_optimizer(params, self.model_params, steps_per_epoch)

        # shardings: tensor/spectral parallelism is a partition-spec assignment
        # on the weight pytree (see parallel/sharding_rules.py); pjit derives
        # the Megatron fork-join collectives and gradient reductions from it
        from makani_tpu.parallel.sharding_rules import infer_param_partition_spec

        specs = infer_param_partition_spec(self.model_params)
        self.param_sharding = jax.tree_util.tree_map(lambda sp: NamedSharding(self.mesh, sp), specs)
        self.data_sharding = NamedSharding(self.mesh, P(("batch", "ensemble"), None, "h", "w"))
        self.zen_sharding = NamedSharding(self.mesh, P(("batch", "ensemble"), None, None, "h", "w"))
        self.model_params = jax.device_put(self.model_params, self.param_sharding)
        # optimizer state inherits the parameter shardings through jit;
        # normalize any stray single-device leaves (scalar counters) onto the mesh
        self.opt_state = self._normalize_opt_sharding(jax.jit(self.tx.init)(self.model_params))

        # checkpointing
        self.checkpoint = CheckpointManager(params)
        self.epoch = 0
        self.iters = 0
        self.best_valid_loss = float("inf")

        if params.get("resuming", False):
            restored = self.checkpoint.restore_latest(self.model_params, self.opt_state)
            if restored is not None:
                model, opt, meta = restored
                # orbax may restore onto a single device; re-apply the shardings
                self.model_params = jax.device_put(model, self.param_sharding)
                if opt is not None:
                    opt_shardings = jax.tree_util.tree_map(lambda t: t.sharding, self.opt_state)
                    self.opt_state = self._normalize_opt_sharding(jax.device_put(opt, opt_shardings))
                self.epoch = meta.get("epoch", 0)
                self.iters = meta.get("iters", 0)
                self.best_valid_loss = meta.get("best_valid_loss", float("inf"))

        # jitted steps
        loss_obj = self.loss_obj
        model = self.model
        tx = self.tx

        import optax

        @partial(jax.jit, donate_argnums=(0, 1))
        def _train_step(model_params, opt_state, inp, tar, zen):
            def loss_fn(p):
                pred = model.apply(p, inp, zen, train=True)
                return loss_obj(pred, tar, inp=inp, train=True)

            loss, grads = jax.value_and_grad(loss_fn)(model_params)
            updates, opt_state = tx.update(grads, opt_state, model_params)
            model_params = optax.apply_updates(model_params, updates)
            return loss, opt_state, model_params

        self._train_step = _train_step

        # dynamic (uncertainty/balanced) loss weighting threads explicit
        # running-stat state through the step (ref loss.py:453-474)
        self.loss_stats = None
        if loss_obj.track_running_stats:
            self.loss_stats = loss_obj.init_stats()

            @partial(jax.jit, donate_argnums=(0, 1, 5))
            def _train_step_stats(model_params, opt_state, inp, tar, zen, stats):
                def loss_fn(p):
                    pred = model.apply(p, inp, zen, train=True)
                    return loss_obj(pred, tar, inp=inp, train=True, stats=stats)

                (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(model_params)
                updates, opt_state = tx.update(grads, opt_state, model_params)
                model_params = optax.apply_updates(model_params, updates)
                return loss, opt_state, model_params, new_stats

            self._train_step_stats = _train_step_stats

        @jax.jit
        def eval_step(model_params, inp, zen):
            return model.apply(model_params, inp, zen, train=False)

        self._eval_step = eval_step

    # ------------------------------------------------------------------
    def _normalize_opt_sharding(self, opt_state):
        replicated = NamedSharding(self.mesh, P())

        def fix(leaf):
            sh = getattr(leaf, "sharding", None)
            if not isinstance(sh, NamedSharding) or sh.mesh.shape != self.mesh.shape:
                return jax.device_put(leaf, replicated)
            return leaf

        return jax.tree_util.tree_map(fix, opt_state)

    def _put_global(self, x, sharding, global_rows: int):
        """Place a (possibly process-local) host array onto the mesh.

        Handles the padded-latitude convention (721 rows over h=2 ship as
        722; transforms, quadrature losses and metrics zero-weight the pads)
        and, under multi-host, assembles the global jax.Array from this
        process's rows/(h, w) IO tile via make_array_from_process_local_data
        (ref makani/utils/dataloader.py io_grid + DistributedSampler).
        """
        from makani_tpu.parallel import multihost

        nh, nw = self.mesh.shape["h"], self.mesh.shape["w"]
        H, W = self.params.get("img_shape_x"), self.params.get("img_shape_y")
        Hp, Wp = H + (-H) % nh, W + (-W) % nw
        x = np.asarray(x)

        if jax.process_count() > 1:
            # the process owning the last (h, w) tile pads it to the sharded extent
            tx = tuple(self.params.get("io_tile_x", (0, H)) or (0, H))
            ty = tuple(self.params.get("io_tile_y", (0, W)) or (0, W))
            pad_h = (Hp - H) if tx[1] == H else 0
            pad_w = (Wp - W) if ty[1] == W else 0
            if pad_h or pad_w:
                x = np.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, pad_h), (0, pad_w)])
            gshape = (global_rows, *x.shape[1:-2], Hp, Wp)
            return multihost.make_global_array(x, self.mesh, sharding.spec, gshape)

        if Hp != H or Wp != W:
            x = np.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, Hp - x.shape[-2]), (0, Wp - x.shape[-1])])
        return jax.device_put(x, sharding)

    def _put_batch(self, batch):
        B = getattr(self.train_loader, "global_batch_size", batch["inp"].shape[0])
        inp = self._put_global(batch["inp"], self.data_sharding, B)
        tar = self._put_global(batch["tar"], self.data_sharding, B)
        zen = self._put_global(batch["zen"], self.zen_sharding, B) if "zen" in batch else None
        return inp, tar, zen

    def train_one_epoch(self):
        t0 = time.time()
        n_samples = 0
        losses = []
        io_bytes = 0
        for batch in self.train_loader:
            io_bytes += sum(int(np.prod(v.shape)) * 4 for v in batch.values())
            inp, tar, zen = self._put_batch(batch)
            if self.loss_stats is not None:
                loss, self.opt_state, self.model_params, self.loss_stats = self._train_step_stats(
                    self.model_params, self.opt_state, inp, tar, zen, self.loss_stats
                )
            else:
                loss, self.opt_state, self.model_params = self._train_step(self.model_params, self.opt_state, inp, tar, zen)
            losses.append(loss)
            n_samples += batch["inp"].shape[0]
            self.iters += 1
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        dt = time.time() - t0
        return {
            "train_loss": train_loss,
            "train_samples_per_sec": n_samples / dt,
            "train_time": dt,
            "step_time_ms": 1000.0 * dt / max(1, len(losses)),
            # effective host->device IO rate (ref deterministic_trainer.py:465-474)
            "effective_io_rate_gbs": io_bytes / dt / 1e9,
        }

    def validate_one_epoch(self):
        """Autoregressive rollout validation (ref deterministic_trainer.py:636)."""
        self.metrics.reset()
        n_hist = self.params.get("n_history", 0)
        n_out = len(self.params.get("out_channels"))
        T = n_hist + 1
        valid_losses = []
        S = self.params.get("valid_autoreg_steps", 0) + 1

        for batch in self.valid_loader:
            inp, tar, zen = self._put_batch(batch)
            inpt = inp
            step_losses = []
            for step in range(S):
                zwin = None if zen is None else zen[:, step : step + T]
                pred = self._eval_step(self.model_params, inpt, zwin)
                tstep = tar[:, step * n_out : (step + 1) * n_out]
                self.metrics.update(pred, tstep, step)
                # accumulate the loss over the whole autoregressive rollout
                # (ref deterministic_trainer.py:636-720), not just step 0
                step_losses.append(self.loss_obj(pred, tstep, train=False))
                if step < S - 1:
                    inpt = self.preprocessor.append_history(inpt, pred, step)
            valid_losses.append(jnp.mean(jnp.stack(step_losses)))
        logs = self.metrics.finalize()
        logs["valid_loss"] = float(jnp.mean(jnp.stack(valid_losses))) if valid_losses else float("nan")
        return logs

    def train(self):
        max_epochs = self.params.get("max_epochs", 1)
        all_logs = []

        exp_logger = None
        if self.world_rank == 0 and self.params.get("exp_dir"):
            from makani_tpu.utils.logging_utils import ExperimentLogger

            exp_logger = ExperimentLogger(
                self.params.get("exp_dir"),
                config=self.params.to_dict() if hasattr(self.params, "to_dict") else None,
                log_to_wandb=self.params.get("log_to_wandb", False),
                name=self.params.get("run_name"),
            )

        while self.epoch < max_epochs:
            self.epoch += 1
            # pin the shuffle order to the global epoch number so a
            # checkpoint-restart resumes the identical batch sequence (the
            # reference's DistributedSampler.set_epoch semantics)
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(self.epoch)
            train_logs = self.train_one_epoch()
            valid_logs = self.validate_one_epoch()
            logs = {**train_logs, **valid_logs, "epoch": self.epoch}
            all_logs.append(logs)
            if self.world_rank == 0:
                logger.info(
                    f"epoch {self.epoch}: train_loss={logs['train_loss']:.5f} "
                    f"valid_loss={logs['valid_loss']:.5f} "
                    f"samples/s={logs['train_samples_per_sec']:.2f}"
                )
            if exp_logger is not None:
                exp_logger.log(logs, step=self.epoch)
            is_best = logs["valid_loss"] < self.best_valid_loss
            if is_best:
                self.best_valid_loss = logs["valid_loss"]
            if self.params.get("save_checkpoint", "none") != "none":
                self.checkpoint.save(
                    self.model_params,
                    self.opt_state,
                    meta={"epoch": self.epoch, "iters": self.iters, "best_valid_loss": self.best_valid_loss},
                    is_best=is_best,
                )
        return all_logs
