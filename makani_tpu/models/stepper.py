"""Single/multi-step model wrappers (ref makani/models/stepper.py:23-349).

``SingleStepWrapper`` binds the core network to its preprocessor: raw physical
input goes in, a physical prediction comes out (unpredicted features appended,
history-normalized, static features added, model forward, bias correction,
denormalization).

``MultiStepWrapper`` rolls the model out autoregressively for ``n_future+1``
steps, sliding the history window and feeding each step the matching window
of the unpredicted-feature sequence. TPU redesign vs the reference:

  * the rollout is a pure function: the reference's cached
    ``unpredicted_inp/tar`` buffers become the explicit ``unpredicted``
    argument, a time-major sequence ``(B, n_history+1+n_future, Cz, H, W)``,
  * rollout activation checkpointing is `jax.checkpoint` per step
    (``multistep_checkpoint``; ref stepper.py:256-257),
  * push-forward mode uses `lax.stop_gradient` between steps.

Steps are unrolled in Python by default (n_future is small: <= 4 in every
reference recipe); XLA shares the weights across the unrolled copies. For
long rollouts, ``use_scan=True`` switches to a single `nn.scan` step whose
trace/compile cost is O(1) in ``n_future`` (the per-step window of the
unpredicted sequence is pre-gathered into the scan xs).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.preprocessor import Preprocessor2D

__all__ = ["SingleStepWrapper", "MultiStepWrapper"]


class SingleStepWrapper(nn.Module):
    model: nn.Module
    preprocessor: Preprocessor2D

    @nn.compact
    def __call__(self, inp, unpredicted=None, deterministic: bool = True):
        pre = self.preprocessor
        inpa = pre.append_unpredicted_features(inp, unpredicted)
        stats = pre.history_compute_stats(inpa)
        inpan = pre.history_normalize(inpa, stats)
        inpans = pre.add_static_features(inpan)
        yn = self.model(inpans, deterministic=deterministic)
        yn = pre.correct_bias(yn)
        return pre.history_denormalize(yn, stats)


class MultiStepWrapper(nn.Module):
    model: nn.Module
    preprocessor: Preprocessor2D
    n_future: int = 0
    push_forward: bool = False
    multistep_checkpoint: bool = False
    use_scan: bool = False

    @nn.compact
    def __call__(self, inp, unpredicted=None, deterministic: bool = True, train: bool = True):
        """``inp``: (B, (n_history+1)*C, H, W); ``unpredicted``: time-major
        (B, n_history+1+n_future, Cz, H, W) or None. Training returns all
        steps concatenated along channels; eval returns the first step only
        (matching ref stepper.py:286-349)."""
        pre = self.preprocessor
        T = pre.n_history + 1

        if not train:
            unp = None if unpredicted is None else unpredicted[:, :T]
            return self._step(inp, unp, deterministic)

        if self.use_scan and self.n_future > 0:
            return self._rollout_scan(inp, unpredicted, deterministic)

        results = []
        inpt = inp
        for step in range(self.n_future + 1):
            if self.push_forward:
                inpt = jax.lax.stop_gradient(inpt)
            unp = None if unpredicted is None else unpredicted[:, step : step + T]
            pred = self._step(inpt, unp, deterministic, remat=self.multistep_checkpoint and not self.push_forward)
            results.append(pred)
            if step == self.n_future:
                break
            inpt = pre.append_history(inpt, pred, step)

        return jnp.concatenate(results, axis=1)

    def _rollout_scan(self, inp, unpredicted, deterministic):
        """lax.scan rollout: one traced model copy regardless of n_future."""
        pre = self.preprocessor
        T = pre.n_history + 1
        S = self.n_future + 1

        if unpredicted is not None:
            # per-step windows as scan xs: (S, B, T, Cz, H, W)
            wins = jnp.stack([unpredicted[:, s : s + T] for s in range(S)], axis=0)
        else:
            wins = jnp.zeros((S,), jnp.float32)  # placeholder xs

        has_unp = unpredicted is not None
        push_forward = self.push_forward

        def body(mdl, carry, xs):
            inpt = jax.lax.stop_gradient(carry) if push_forward else carry
            unp = xs if has_unp else None
            inpa = pre.append_unpredicted_features(inpt, unp)
            stats = pre.history_compute_stats(inpa)
            inpan = pre.history_normalize(inpa, stats)
            inpans = pre.add_static_features(inpan)
            yn = mdl(inpans, deterministic=deterministic)
            yn = pre.correct_bias(yn)
            pred = pre.history_denormalize(yn, stats)
            return pre.append_history(inpt, pred, 0), pred

        if self.multistep_checkpoint and not push_forward:
            body = nn.remat(body, prevent_cse=False)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
            length=S,
        )
        _, preds = scan(self.model, inp, wins)  # (S, B, C, H, W)
        preds = jnp.moveaxis(preds, 0, 1)  # (B, S, C, H, W)
        return preds.reshape(preds.shape[0], -1, *preds.shape[-2:])

    def _step(self, inpt, unp, deterministic, remat: bool = False):
        pre = self.preprocessor
        inpa = pre.append_unpredicted_features(inpt, unp)
        stats = pre.history_compute_stats(inpa)
        inpan = pre.history_normalize(inpa, stats)
        inpans = pre.add_static_features(inpan)
        if remat:
            # recompute the model forward in the backward pass: O(1) rollout
            # activation memory instead of O(n_future)
            yn = nn.remat(lambda mdl, v: mdl(v, deterministic=deterministic))(self.model, inpans)
        else:
            yn = self.model(inpans, deterministic=deterministic)
        yn = pre.correct_bias(yn)
        return pre.history_denormalize(yn, stats)
