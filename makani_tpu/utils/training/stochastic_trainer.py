"""Stochastic-interpolant trainer (ref makani/utils/training/
stochastic_trainer.py:59-776).

Trains the drift model of the stochastic interpolant: per batch, sample
interpolation times s ~ U(0, 1) and spherical GRF noise, build the
interpolated state x_s and the analytic drift target, and regress the model
drift onto it (quadrature-weighted L2). Validation integrates the SDE
(Euler-Maruyama, optional Foellmer schedule) to produce a forecast and scores
it with the standard metrics.
"""

from __future__ import annotations

import logging
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.models.model_registry import get_model_handle
from makani_tpu.models.noise import IsotropicGaussianRandomFieldS2
from makani_tpu.models.stochastic_interpolant import StochasticInterpolant, StochasticInterpolantWrapper
from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.checkpoint_helpers import CheckpointManager
from makani_tpu.utils.dataloader import get_dataloader
from makani_tpu.utils.grids import GridQuadrature, grid_to_quadrature_rule
from makani_tpu.utils.loss import LossHandler
from makani_tpu.utils.metric import MetricsHandler
from makani_tpu.utils.training.optimizer import get_optimizer

logger = logging.getLogger(__name__)

__all__ = ["StochasticTrainer"]


class StochasticTrainer:
    """Single-host trainer (multi-host support lives in the deterministic /
    ensemble trainers; under jax.distributed this one fails loudly at
    device_put rather than mis-assembling batches)."""

    def __init__(self, params, world_rank: int = 0):
        self.params = params
        self.world_rank = world_rank
        self.noise_epsilon = params.get("noise_epsilon", 1.0)
        self.n_sde_steps = params.get("n_sde_steps", 10)
        self.foellmer = params.get("foellmer", False)

        self.mesh = pmesh.init(
            h=params.get("h_parallel_size", 1),
            w=params.get("w_parallel_size", 1),
            matmul=params.get("parameters_split_size", 1),
            ensemble=params.get("ensemble_parallel_size", 1),
        )

        self.train_loader, self.train_dataset = get_dataloader(params, params.get("train_data_path", ""), mode="train")
        self.valid_loader, self.valid_dataset = get_dataloader(params, params.get("valid_data_path", ""), mode="eval")

        n_out = len(params.get("out_channels"))
        n_dyn = 1 if params.get("add_zenith", False) else 0
        H, W = params.get("img_shape_x"), params.get("img_shape_y")

        # core drift network consumes [x_s, x0, aux, s] channels
        handle = get_model_handle(params.get("nettype", "SFNO"))
        core_kwargs = dict(
            inp_shape=(H, W),
            out_shape=(H, W),
            inp_chans=2 * n_out + n_dyn + 1,
            out_chans=n_out,
        )
        fields = set(getattr(handle, "__dataclass_fields__", {}))
        for key in ("scale_factor", "embed_dim", "num_layers", "normalization_layer", "operator_type", "filter_type", "hard_thresholding_fraction"):
            if key in fields and params.get(key, None) is not None:
                core_kwargs[key] = params.get(key)
        core = handle(**{k: v for k, v in core_kwargs.items() if k in fields})

        self.interpolant = StochasticInterpolant(self.noise_epsilon)
        self.model = StochasticInterpolantWrapper(model=core, interpolant=self.interpolant, n_pred_chans=n_out)

        self.loss_obj = LossHandler(params)
        self.metrics = MetricsHandler(params)
        self.quadrature = GridQuadrature(
            grid_to_quadrature_rule(params.get("model_grid_type", "equiangular")), img_shape=(H, W), normalize=True
        )

        # init params
        dummy_x0 = jnp.zeros((1, n_out, H, W), jnp.float32)
        dummy_zen = jnp.zeros((1, 1, 1, H, W), jnp.float32) if n_dyn else None
        dummy_s = jnp.zeros((1,), jnp.float32)
        self.model_params = self.model.init(jax.random.PRNGKey(params.get("seed", 333)), dummy_x0, dummy_x0, dummy_zen, dummy_s)

        steps_per_epoch = max(1, len(self.train_loader))
        self.tx, self.schedule = get_optimizer(params, self.model_params, steps_per_epoch)

        self.data_sharding = NamedSharding(self.mesh, P(("batch", "ensemble"), None, "h", "w"))
        self.zen_sharding = NamedSharding(self.mesh, P(("batch", "ensemble"), None, None, "h", "w"))
        self.param_sharding = NamedSharding(self.mesh, P())
        self.model_params = jax.device_put(self.model_params, self.param_sharding)
        self.opt_state = jax.jit(self.tx.init)(self.model_params)

        self.grf = IsotropicGaussianRandomFieldS2(
            (H, W),
            num_channels=n_out,
            sigma=params.get("interpolant_noise_sigma", 1.0),
            alpha=params.get("interpolant_noise_alpha", 2.0),
            grid_type=params.get("model_grid_type", "equiangular"),
        )
        self._rng = jax.random.PRNGKey(params.get("seed", 333) + 7)

        self.checkpoint = CheckpointManager(params)
        self.epoch = 0
        self.iters = 0
        self.best_valid_loss = float("inf")

        import optax
        from functools import partial

        model, tx, itp, quad = self.model, self.tx, self.interpolant, self.quadrature

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(p, st, x0, x1, zen, noise, s):
            sb = s.reshape(-1, 1, 1, 1)
            xs = itp.interpolant(x0, x1, noise, sb)
            target = itp.drift_target(x0, x1, noise, sb)

            def loss_fn(q):
                b = model.apply(q, x0, xs, zen, s, deterministic=False)
                return jnp.mean(quad(jnp.square(b - target)))

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, st2 = tx.update(grads, st, p)
            return loss, st2, optax.apply_updates(p, updates)

        self._si_train_step = step

    def train_one_epoch(self):
        t0 = time.time()
        losses = []
        n_samples = 0
        n_out = len(self.params.get("out_channels"))
        for batch in self.train_loader:
            x0 = jax.device_put(batch["inp"][:, :n_out], self.data_sharding)
            x1 = jax.device_put(batch["tar"][:, :n_out], self.data_sharding)
            zen = jax.device_put(batch["zen"], self.zen_sharding) if "zen" in batch else None
            self._rng, k1, k2 = jax.random.split(self._rng, 3)
            noise = self.grf.sample(self.grf.init_state(k1, x0.shape[0]))[:, 0]
            s = jax.random.uniform(k2, (x0.shape[0],), minval=1e-4, maxval=1.0)
            loss, self.opt_state, self.model_params = self._si_train_step(
                self.model_params, self.opt_state, x0, x1, zen, noise, s
            )
            losses.append(loss)
            n_samples += x0.shape[0]
            self.iters += 1
        dt = time.time() - t0
        return {
            "train_loss": float(jnp.mean(jnp.stack(losses))) if losses else float("nan"),
            "train_samples_per_sec": n_samples / dt,
            "train_time": dt,
            "step_time_ms": 1000.0 * dt / max(1, len(losses)),
        }

    def validate_one_epoch(self):
        self.metrics.reset()
        n_out = len(self.params.get("out_channels"))
        losses = []
        for batch in self.valid_loader:
            x0 = jnp.asarray(batch["inp"][:, :n_out])
            tar = jnp.asarray(batch["tar"][:, :n_out])
            zen = jnp.asarray(batch["zen"]) if "zen" in batch else None
            self._rng, sub = jax.random.split(self._rng)

            def grf_sampler(key, like):
                return self.grf.sample(self.grf.init_state(key, like.shape[0]))[:, 0].astype(like.dtype)

            pred = self.model.sample(
                self.model_params,
                x0,
                sub,
                unpredicted=zen,
                n_steps=self.n_sde_steps,
                foellmer=self.foellmer,
                noise_sampler=grf_sampler,
            )
            self.metrics.update(pred, tar, 0)
            losses.append(self.loss_obj(pred, tar, train=False))
        logs = self.metrics.finalize()
        logs["valid_loss"] = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        return logs

    def train(self):
        max_epochs = self.params.get("max_epochs", 1)
        all_logs = []
        while self.epoch < max_epochs:
            self.epoch += 1
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(self.epoch)
            logs = {**self.train_one_epoch(), **self.validate_one_epoch(), "epoch": self.epoch}
            all_logs.append(logs)
            if self.world_rank == 0:
                logger.info(f"epoch {self.epoch}: train_loss={logs['train_loss']:.5f} valid_loss={logs['valid_loss']:.5f}")
            if self.params.get("save_checkpoint", "none") != "none":
                is_best = logs["valid_loss"] < self.best_valid_loss
                self.best_valid_loss = min(self.best_valid_loss, logs["valid_loss"])
                self.checkpoint.save(self.model_params, self.opt_state, meta={"epoch": self.epoch, "iters": self.iters}, is_best=is_best)
        return all_logs
