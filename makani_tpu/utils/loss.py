"""Composable loss handler (ref makani/utils/loss.py:57-494).

Builds the configured list of loss terms, attaches per-term channel weights
(constant/auto/"new auto"/pangu/explicit list, optionally scaled by the
time-difference normalization and a relative weight), multistep lead-time
weights, and the tendency-space option, then reduces everything to a scalar.

Pure function design: no running-stat buffers (the reference's
uncertainty/balanced dynamic weighting keeps Welford state; here that state,
when enabled, is carried explicitly by the trainer). Deterministic losses of
5D ensemble predictions consume the ensemble mean, probabilistic losses the
full (B, E, C, H, W) — matching ref loss.py:392-456.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from makani_tpu.utils.dataloaders.data_helpers import get_out_normalization, get_time_diff_stds
from makani_tpu.utils.losses.base_loss import LossType, compute_channel_weighting
from makani_tpu.utils.losses.lp_loss import GeometricLpLoss, SpectralH1Loss, SpectralLpLoss

__all__ = ["LossHandler", "LOSS_REGISTRY"]


def _make_registry():
    from makani_tpu.utils.losses.amse_loss import SpectralAMSELoss
    from makani_tpu.utils.losses.crps_loss import CRPSLoss, SpectralCRPSLoss
    from makani_tpu.utils.losses.energy_score import (
        CorrectedSpectralL2EnergyScoreLoss,
        LpEnergyScoreLoss,
        SobolevEnergyScoreLoss,
        SpectralCoherenceLoss,
        SpectralL2EnergyScoreLoss,
    )
    from makani_tpu.utils.losses.gradient_losses import GradientCRPSLoss, VortDivCRPSLoss
    from makani_tpu.utils.losses.hydrostatic_loss import HydrostaticBalanceLoss
    from makani_tpu.utils.losses.likelihood_loss import EnsembleNLLLoss
    from makani_tpu.utils.losses.mmd_loss import GaussianMMDLoss
    from makani_tpu.utils.losses.regularization import CoherenceRegularization, DriftRegularization, SpectralRegularization

    reg = {
        # deterministic (reference registry names, makani/utils/loss.py:34-55,
        # plus legacy spelled-out aliases)
        "l1": lambda **kw: GeometricLpLoss(p=1.0, **kw),
        "l2": lambda **kw: GeometricLpLoss(p=2.0, **kw),
        "geometric l2": lambda **kw: GeometricLpLoss(p=2.0, **kw),
        "relative l2": lambda **kw: GeometricLpLoss(p=2.0, relative=True, **kw),
        "squared l2": lambda **kw: GeometricLpLoss(p=2.0, squared=True, **kw),
        "spectral l1": lambda **kw: SpectralLpLoss(p=1.0, **kw),
        "spectral l2": lambda **kw: SpectralLpLoss(p=2.0, **kw),
        "spectral-l2": lambda **kw: SpectralLpLoss(p=2.0, **kw),
        "h1": lambda **kw: SpectralH1Loss(**kw),
        "spectral h1": lambda **kw: SpectralH1Loss(**kw),
        "amse": lambda **kw: SpectralAMSELoss(**kw),
        "hydrostatic": lambda **kw: HydrostaticBalanceLoss(**kw),
        # probabilistic
        "crps": lambda **kw: CRPSLoss(**kw),
        "ensemble_crps": lambda **kw: CRPSLoss(**kw),
        "spectral crps": lambda **kw: SpectralCRPSLoss(**kw),
        "ensemble_spectral_crps": lambda **kw: SpectralCRPSLoss(**kw),
        "ensemble_gradient_crps": lambda **kw: GradientCRPSLoss(**kw),
        "ensemble_vort_div_crps": lambda **kw: VortDivCRPSLoss(**kw),
        "ensemble_nll": lambda **kw: EnsembleNLLLoss(**kw),
        "gaussian_mmd": lambda **kw: GaussianMMDLoss(**kw),
        "energy score": lambda **kw: LpEnergyScoreLoss(**kw),
        "lp_energy_score": lambda **kw: LpEnergyScoreLoss(**kw),
        "l2_energy_score": lambda **kw: LpEnergyScoreLoss(p=2.0, **kw),
        "sobolev_energy_score": lambda **kw: SobolevEnergyScoreLoss(**kw),
        "spectral_l2_energy_score": lambda **kw: SpectralL2EnergyScoreLoss(**kw),
        "spectral_coherence": lambda **kw: SpectralCoherenceLoss(**kw),
        "corrected_spectral_l2_energy_score": lambda **kw: CorrectedSpectralL2EnergyScoreLoss(**kw),
        # regularizers
        "drift_regularization": lambda **kw: DriftRegularization(**kw),
        "spectral_regularization": lambda **kw: SpectralRegularization(**kw),
        "coherence_regularization": lambda **kw: CoherenceRegularization(**kw),
    }
    return reg


LOSS_REGISTRY = _make_registry()


def _multistep_weight(n_future: int, weight_type: str = "constant", weights=None) -> np.ndarray:
    """Lead-time weights (ref loss.py:238-278)."""
    n = n_future + 1
    if weight_type == "constant":
        w = np.ones(n) / n
    elif weight_type == "balanced":
        w = 2.0 * np.arange(1, n + 1) / float((n + 1) * n)
    elif weight_type == "linear":
        w = np.arange(1, n + 1) / float(n)
    elif weight_type == "last-n-1":
        w = np.ones(n) / float(n_future)
        w[0] = 0.0
    elif weight_type == "last":
        w = np.zeros(n)
        w[-1] = 1.0
    elif weight_type == "custom":
        w = np.asarray(weights, dtype=np.float64)
        if w.shape[0] != n:
            raise ValueError(f"need {n} multistep weights, got {w.shape[0]}")
    else:
        raise ValueError(f"Unknown multistep loss weight type: {weight_type}")
    return w.astype(np.float32)


class LossHandler:
    def __init__(self, params):
        losses = params.get("losses")
        if losses is None:
            losses = [{"type": params.get("loss", "l2"), "channel_weights": "constant"}]
        if isinstance(losses, dict):
            losses = [losses]

        self.n_future = params.get("n_future", 0)
        self.img_shape = (
            params.get("img_shape_x"),
            params.get("img_shape_y"),
        )
        # the loss sees targets/predictions in out_channels row order, which
        # may reorder in_channels — use out-ordered names/stats throughout
        from makani_tpu.utils.dataloaders.data_helpers import out_channel_names

        channel_names = out_channel_names(params) or params.get("channel_names")

        # dynamic channel weighting from running loss statistics (ref
        # loss.py:86-92, 296-333, 453-474). The reference keeps Welford
        # buffers inside the module; here the state is explicit — the trainer
        # threads it through the jit step via init_stats()/__call__(stats=...)
        self.uncertainty_weighting = params.get("uncertainty_weighting", False)
        self.balanced_weighting = params.get("balanced_weighting", False)
        self.track_running_stats = self.uncertainty_weighting or self.balanced_weighting
        self.stats_warmup_batches = params.get("loss_stats_warmup_batches", 100)
        self.eps = 1e-6

        # stochastic loss options (ref loss.py:371-399, 476-483); both need a
        # PRNG key passed to __call__ during training
        self.random_slice_loss = params.get("random_slice_loss", False)
        self.randomized_loss_weights = params.get("randomized_loss_weights", False)
        self.needs_rng = self.random_slice_loss or self.randomized_loss_weights

        bias, scale = (None, None)
        try:
            bias, scale = get_out_normalization(params)
        except Exception:
            pass

        self.loss_fns = []
        self.loss_types = []
        self.loss_requires_input = []
        channel_weights = []

        for loss in losses:
            loss_params = loss.get("parameters", {}) or {}
            handle = LOSS_REGISTRY.get(loss["type"])
            if handle is None:
                raise NotImplementedError(f"Unknown loss function: {loss['type']}")
            fn = handle(
                img_shape=self.img_shape,
                channel_names=channel_names,
                grid_type=params.get("model_grid_type", "equiangular"),
                bias=bias,
                scale=scale,
                **loss_params,
            )
            self.loss_fns.append(fn)
            self.loss_types.append(fn.type)
            self.loss_requires_input.append(loss.get("tendency", False))

            cw_type = loss.get("channel_weights", "constant")

            if loss.get("temp_diff_normalization", False):
                tds = get_time_diff_stds(params).reshape(-1)
                out_ch = np.asarray(params.get("out_channels", range(len(channel_names))))
                tds = np.clip(tds[out_ch] if tds.shape[0] > len(out_ch) - 1 else tds, 1e-4, None)
                if scale is not None:
                    time_diff_scale = scale.reshape(-1) / tds
                else:
                    time_diff_scale = 1.0 / tds
            else:
                time_diff_scale = None

            if isinstance(cw_type, (list, tuple)):
                chw = np.asarray(cw_type, dtype=np.float32).reshape(-1)
                if time_diff_scale is not None:
                    chw = chw * time_diff_scale
            else:
                chw = compute_channel_weighting(channel_names, cw_type, time_diff_scale=time_diff_scale)

            # losses that define their own channel count (hydrostatic residuals,
            # channel-reduced scores, per-component gradient CRPS) get uniform
            # weights over their outputs (ref loss.py: per-loss
            # compute_channel_weighting hooks)
            n_ch = getattr(fn, "n_channels", len(channel_names))
            if n_ch != chw.shape[0]:
                if n_ch == 2 * chw.shape[0]:
                    chw = np.repeat(chw, 2) / 2.0  # component-doubled channels
                else:
                    chw = np.full(n_ch, 1.0 / n_ch, dtype=np.float32)

            chw = chw * loss.get("relative_weight", 1.0)
            channel_weights.append(chw.reshape(1, -1))

        self.channel_weights = np.concatenate(channel_weights, axis=1).astype(np.float32)

        ms = params.get("multistep", {"weight_type": "constant"}) or {}
        msw = _multistep_weight(self.n_future, ms.get("weight_type", "constant"), ms.get("weights"))
        ncw = self.channel_weights.shape[1]
        self.multistep_weight = np.repeat(msw.reshape(1, -1), ncw, axis=1).reshape(1, -1)

    @property
    def n_channels(self):
        return self.channel_weights.shape[1]

    # ---- running loss statistics (Chan's parallel Welford) -----------------
    def init_stats(self):
        """Zero state for the running per-channel loss statistics; width is
        the training-time loss vector: n_channels x (n_future + 1)."""
        K = self.n_channels * (self.n_future + 1)
        return {
            "count": jnp.zeros((), jnp.float32),
            "mean": jnp.zeros((K,), jnp.float32),
            "m2": jnp.zeros((K,), jnp.float32),
        }

    @staticmethod
    def update_stats(stats, vals):
        """Merge a batch of per-channel loss values (B, K) into the running
        mean/M2 (Chan et al., pairwise variance update)."""
        vals = jax.lax.stop_gradient(vals.astype(jnp.float32))
        nb = float(vals.shape[0])
        mean_b = jnp.mean(vals, axis=0)
        m2_b = jnp.var(vals, axis=0) * nb
        n = stats["count"]
        tot = n + nb
        delta = mean_b - stats["mean"]
        return {
            "count": tot,
            "mean": stats["mean"] + delta * nb / tot,
            "m2": stats["m2"] + m2_b + jnp.square(delta) * n * nb / tot,
        }

    def _dynamic_weight(self, chw, stats):
        """Scale the static channel weights by the running statistics:
        uncertainty: w / sqrt(2 var)   (Kendall & Gal homoscedastic weighting)
        balanced:    w / mean          (equalizes loss magnitudes).
        Inactive (identity) during the warmup batches."""
        active = stats["count"] > self.stats_warmup_batches
        if self.uncertainty_weighting:
            var = stats["m2"] / jnp.maximum(stats["count"], 1.0)
            scaled = chw / (jnp.sqrt(2.0 * var) + self.eps)
        else:
            scaled = chw / (stats["mean"] + self.eps)
        return jnp.where(active, scaled, chw)

    def __call__(self, prd, tar, wgt=None, inp=None, train: bool = True, stats=None, key=None):
        """prd: (B, (n_future+1)*C, H, W) or (B, E, C, H, W); tar matches.

        When ``stats`` (from init_stats) is passed, returns ``(loss,
        new_stats)`` and applies the configured dynamic weighting. ``key`` is
        required when random_slice_loss / randomized_loss_weights are on."""
        if train and self.random_slice_loss and key is not None:
            # score random channel mixtures instead of raw channels: a random
            # unit-row matrix applied as a 1x1 conv (ref loss.py:371-399)
            key, sub = jax.random.split(key)
            C = prd.shape[-3]
            rslice = jax.random.normal(sub, (C, C), prd.dtype)
            rslice = rslice / jnp.linalg.norm(rslice, axis=1, keepdims=True)
            mix = lambda x: jnp.einsum("oc,...chw->...ohw", rslice, x)
            prd, tar = mix(prd), mix(tar)

        # ensemble mean for deterministic losses
        if prd.ndim == 5:
            prdm = jnp.mean(prd, axis=1)
        else:
            prdm = prd

        if inp is not None and any(self.loss_requires_input):
            # tendency space: subtract the most recent input state
            n_per_step = tar.shape[1] // (self.n_future + 1)
            inp_state = inp[:, -n_per_step:]
            reps = tar.shape[1] // n_per_step
            inp_rep = jnp.tile(inp_state, (1, reps, 1, 1))
            prdm_t = prdm - inp_rep
            tar_t = tar - inp_rep
            prd_t = prd - inp_rep[:, None] if prd.ndim == 5 else prdm_t
        else:
            prdm_t, tar_t, prd_t = prdm, tar, prd

        vals = []
        for fn, req, ltype in zip(self.loss_fns, self.loss_requires_input, self.loss_types):
            if ltype == LossType.Deterministic:
                vals.append(fn(prdm_t if req else prdm, tar_t if req else tar, wgt))
            else:
                vals.append(fn(prd_t if req else prd, tar_t if req else tar, wgt))
        all_losses = jnp.concatenate(vals, axis=-1)

        chw = jnp.asarray(self.channel_weights)
        if train and self.n_future > 0:
            chw = jnp.tile(chw, (1, self.n_future + 1)) * jnp.asarray(self.multistep_weight)
        elif all_losses.shape[-1] != chw.shape[-1]:
            # eval rollouts may score a single step
            reps = all_losses.shape[-1] // chw.shape[-1]
            chw = jnp.tile(chw, (1, reps)) / reps

        if train and self.randomized_loss_weights and key is not None:
            key, sub = jax.random.split(key)
            rmask = jax.random.uniform(sub, chw.shape, chw.dtype)
            chw = chw * rmask / rmask.sum()

        new_stats = None
        if stats is not None and self.track_running_stats:
            if train:
                new_stats = self.update_stats(stats, all_losses)
                chw = self._dynamic_weight(chw, new_stats)
            else:
                new_stats = stats

        loss = jnp.mean(jnp.sum(chw * all_losses, axis=1), axis=0)
        if stats is not None:
            return loss, new_stats if new_stats is not None else stats
        return loss
