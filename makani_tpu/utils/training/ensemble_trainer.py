"""Ensemble (probabilistic) trainer — ref makani/utils/training/
ensemble_trainer.py:62-839.

Trains with an ensemble of perturbed forecasts scored by probabilistic losses
(CRPS family / energy scores). The reference folds the local ensemble into
the batch dimension and splits members across the "ensemble" process group;
here the fold is the same but the split is a sharding: arrays of leading
dimension B*E are sharded over the mesh's ("batch", "ensemble") axes, so
members land on the ensemble axis automatically.

Noise design: the stochastic input noise (spherical GRF / OU diffusion) is
exogenous — its state evolution does not depend on the model — so the full
noise time series for a rollout is drawn *before* the step and fed through
the same per-step window mechanism as the zenith channels. This keeps the
whole ensemble train step one pure jit function (the reference mutates noise
buffers inside the rollout). Antithetic ("centered") pairing negates the
innovations of every second member (ref preprocessor.py:154-167).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from makani_tpu.models.noise import build_noise
from makani_tpu.utils.training.deterministic_trainer import Trainer

__all__ = ["EnsembleTrainer"]


def expand_ensemble(x, E: int):
    """(B, ...) -> (B*E, ...) by repetition (ref utils/functions.py:29-43)."""
    return jnp.repeat(x, E, axis=0)


def fold_ensemble(x, E: int):
    """(B*E, C, H, W) -> (B, E, C, H, W)."""
    B = x.shape[0] // E
    return x.reshape(B, E, *x.shape[1:])


class EnsembleTrainer(Trainer):
    def __init__(self, params, world_rank: int = 0):
        self.ensemble_size = params.get("ensemble_size", 1)
        noise_params = params.get("input_noise", None)
        if noise_params is None:
            raise ValueError("EnsembleTrainer requires an input_noise config")
        self.centered = noise_params.get("centered", False)
        if self.centered and self.ensemble_size % 2 != 0:
            raise ValueError("centered (antithetic) noise needs an even ensemble size")
        self.noise_mode = noise_params.get("mode", "concatenate")

        super().__init__(params, world_rank)

        img_shape = (params.get("img_shape_x"), params.get("img_shape_y"))
        noise_cfg = dict(noise_params, grid_type=params.get("model_grid_type", "equiangular"))
        if self.noise_mode == "perturb":
            # one noise channel per perturbed input channel (ref
            # preprocessor.py:176-179); the preprocessor adds them in place
            noise_cfg["n_channels"] = len(self.preprocessor.perturb_channels)
        self.noise = build_noise(noise_cfg, img_shape, num_time_steps=1)
        # one global key; per-(batch row, antithetic pair) streams are derived
        # by fold_in inside _noise_rows, so every process draws identical noise
        # for a given global row regardless of the process layout (independence
        # across rows AND cross-host reproducibility — the round-2 per-process
        # fold_in gave independence but broke layout-invariance)
        self._noise_key = jax.random.PRNGKey(params.get("seed", 333) + 1)
        self._ens_train_step = self._build_ens_train_step()

        # targets are NOT ensemble-folded: they shard over the batch axis only,
        # while folded (B*E) arrays shard over ("batch", "ensemble")
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.tar_sharding = NamedSharding(self.mesh, P("batch", None, "h", "w"))

    # -- channel bookkeeping: zenith + noise are both per-step appended channels
    def _noise_rows(self, key, bs, es, total_steps):
        """Draw noise time series (rows, total_steps, Cn, H, W) for explicit
        global (batch-row, member) pairs.

        The stream for each row is keyed by its *global* (batch row, antithetic
        pair) ids, so the draw is independent of how rows are laid out across
        processes — the multi-host parity anchor. Antithetic ("centered")
        members 2k/2k+1 derive from the same pair key with opposite sign, which
        keeps the pairing exact even when a pair straddles two processes
        (ref preprocessor.py:154-167 seeds by ensemble rank instead).
        """
        bs = jnp.asarray(bs, jnp.uint32)
        pair = jnp.asarray(es, jnp.uint32) // 2 if self.centered else jnp.asarray(es, jnp.uint32)

        def one(b, p):
            k = jax.random.fold_in(jax.random.fold_in(key, b), p)
            keys = jax.random.split(k, total_steps)
            state = self.noise.init_state(keys[0], 1)
            fields = [self.noise.sample(state)[0, 0]]
            for t in range(1, total_steps):
                state = self.noise.update(state, keys[t], replace_state=False)
                fields.append(self.noise.sample(state)[0, 0])
            return jnp.stack(fields, axis=0)  # (T, Cn, H, W)

        seq = jax.vmap(one)(bs, pair)
        if self.centered:
            sign = jnp.where(jnp.asarray(es) % 2 == 1, -1.0, 1.0).astype(seq.dtype)
            seq = seq * sign[:, None, None, None, None]
        return seq

    def _local_folded_rows(self, gb: int, loader):
        """Global folded (B*E) row ids this process feeds, plus the loader's
        local row offset. Single-process: all rows."""
        E = self.ensemble_size
        if jax.process_count() == 1:
            return np.arange(gb * E), 0
        from makani_tpu.parallel import multihost

        fslice = multihost.local_batch_slice(self.mesh, gb * E)
        rows = np.arange(fslice.start, fslice.stop)
        b_off = 0
        rs = getattr(loader, "row_slice", None)
        if rs is not None:
            b_off = rs.start or 0
        return rows, b_off

    def _prepare_ensemble_batch(self, batch, total_steps: int, key, loader=None):
        """Fold the ensemble into the batch dim and attach noise channels.

        Multi-host: the loader holds only this process's *unfolded* batch rows;
        gather them into the locally-owned folded (B*E) rows (members of the
        same sample may live on different processes — the ensemble axis may
        span hosts, ref config/fourcastnet3.yaml:222-233 trains ensemble 16
        across 256 ranks).
        """
        loader = loader if loader is not None else self.train_loader
        E = self.ensemble_size
        gb = getattr(loader, "global_batch_size", batch["inp"].shape[0])
        rows, b_off = self._local_folded_rows(gb, loader)
        bs, es = rows // E, rows % E

        inp = jnp.asarray(np.asarray(batch["inp"])[bs - b_off])
        tar = jnp.asarray(batch["tar"])
        zen = jnp.asarray(np.asarray(batch["zen"])[bs - b_off]) if "zen" in batch else None

        noise_seq = self._noise_rows(key, bs, es, total_steps)

        if self.noise_mode not in ("concatenate", "perturb"):
            raise NotImplementedError(f"noise mode {self.noise_mode}")
        # both modes pack [zenith..., noise...] along the channel axis; in
        # perturb mode the preprocessor peels the trailing noise channels off
        # and adds them to the selected input channels
        unp = jnp.concatenate([zen, noise_seq], axis=2) if zen is not None else noise_seq
        return inp, tar, unp

    def train_one_epoch(self):
        import time

        t0 = time.time()
        losses = []
        n_samples = 0
        n_hist = self.params.get("n_history", 0)
        total_steps = n_hist + 1 + self.n_future
        for batch in self.train_loader:
            self._noise_key, sub = jax.random.split(self._noise_key)
            inp, tar, unp = self._prepare_ensemble_batch(batch, total_steps, sub)
            gb = getattr(self.train_loader, "global_batch_size", batch["inp"].shape[0])
            inp = self._put_global(inp, self.data_sharding, gb * self.ensemble_size)
            tar = self._put_global(tar, self.tar_sharding, gb)
            unp = self._put_global(unp, self.zen_sharding, gb * self.ensemble_size)
            loss, self.opt_state, self.model_params = self._ens_train_step(
                self.model_params, self.opt_state, inp, tar, unp
            )
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
        }

    def _build_ens_train_step(self):
        import optax
        from functools import partial

        model, loss_obj, tx, E = self.model, self.loss_obj, self.tx, self.ensemble_size

        # ensemble_fold_chunk=c (divides E): member-chunked forward under a
        # rematerialized scan. The forward is member-independent (only the
        # probabilistic loss couples members), so activations peak at one
        # c-member chunk while only the (B, E, ...) predictions persist for
        # the joint loss — the single-chip answer to E=16 folds whose full-res
        # encoder hidden otherwise OOMs (the reference instead requires one
        # GPU per member, config/fourcastnet3.yaml:222-233). Exact-equivalence
        # tested vs the plain fold (tests/test_ensemble_chunked.py).
        chunk = int(self.params.get("ensemble_fold_chunk", 0) or 0)
        n_chunks = E // chunk if chunk and chunk < E else 0
        if n_chunks and E % chunk:
            raise ValueError(f"ensemble_fold_chunk {chunk} must divide ensemble_size {E}")

        def _apply_folded(q, inp, unp):
            if not n_chunks:
                return model.apply(q, inp, unp, train=True)  # (B*E, steps*C, H, W)
            B = inp.shape[0] // E

            def to_chunks(t):
                t = t.reshape(B, n_chunks, chunk, *t.shape[1:])
                t = jnp.swapaxes(t, 0, 1)
                return t.reshape(n_chunks, B * chunk, *t.shape[3:])

            @jax.checkpoint
            def body(_, xz):
                xi, zi = xz
                return None, model.apply(q, xi, zi, train=True)

            _, preds = jax.lax.scan(body, None, (to_chunks(inp), to_chunks(unp)))
            preds = preds.reshape(n_chunks, B, chunk, *preds.shape[2:])
            return jnp.swapaxes(preds, 0, 1).reshape(B * E, *preds.shape[3:])

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(p, s, inp, tar, unp):
            def loss_fn(q):
                pred = _apply_folded(q, inp, unp)  # (B*E, steps*C, H, W)
                pred = fold_ensemble(pred, E)  # (B, E, steps*C, H, W)
                return loss_obj(pred, tar, train=True)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            # same return order as the parent trainer: (loss, opt_state, params)
            return loss, s, optax.apply_updates(p, updates)

        return step

    def validate_one_epoch(self):
        """Ensemble rollout validation: CRPS/spread/SSR over the members."""
        self.metrics.reset()
        E = self.ensemble_size
        n_hist = self.params.get("n_history", 0)
        n_out = len(self.params.get("out_channels"))
        T = n_hist + 1
        S = self.params.get("valid_autoreg_steps", 0) + 1
        valid_losses = []

        for batch in self.valid_loader:
            total_steps = max(n_hist + S, T)
            self._noise_key, sub = jax.random.split(self._noise_key)
            inp, tar, unp = self._prepare_ensemble_batch(batch, total_steps, sub, loader=self.valid_loader)

            gb = getattr(self.valid_loader, "global_batch_size", batch["inp"].shape[0])
            inp = self._put_global(inp, self.data_sharding, gb * E)
            tar = self._put_global(tar, self.tar_sharding, gb)
            unp = self._put_global(unp, self.zen_sharding, gb * E)

            inpt = inp
            step_losses = []
            for step in range(S):
                uwin = unp[:, step : step + T] if unp.shape[1] >= step + T else unp[:, -T:]
                pred = self._eval_step(self.model_params, inpt, uwin)
                pred_e = fold_ensemble(pred, E)
                tstep = tar[:, step * n_out : (step + 1) * n_out]
                self.metrics.update(pred_e, tstep, step)
                # accumulate the loss over the whole autoregressive rollout
                # (ref ensemble_trainer.py validates every step), matching the
                # deterministic trainer
                step_losses.append(self.loss_obj(pred_e, tstep, train=False))
                if step < S - 1:
                    inpt = self.preprocessor.append_history(inpt, pred, step)
            valid_losses.append(jnp.mean(jnp.stack(step_losses)))
        logs = self.metrics.finalize()
        logs["valid_loss"] = float(jnp.mean(jnp.stack(valid_losses))) if valid_losses else float("nan")
        return logs
