"""Validation-rollout metric parity: trainer loop vs independent recomputation.

The reference validates by autoregressive rollout, feeding each step's
prediction back as input and scoring every step against the matching target
window (deterministic_trainer.py:636-720). This pins our
``Trainer.validate_one_epoch`` end-to-end: the logged rollout curves and
``valid_loss`` must equal an independent re-rollout over the same validation
loader using only the public model/loss/metric pieces — catching plumbing
bugs (wrong target window, history slide off-by-one, metric accumulation
mixing steps or batches) that per-function unit tests cannot see.
"""

import numpy as np

import jax.numpy as jnp
import pytest

from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.metrics.functions import weighted_acc, weighted_l1, weighted_rmse
from makani_tpu.utils.grids import GridQuadrature
from makani_tpu.utils.yparams import ParamsBase


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def _params(tmp_path, **over):
    base = dict(
        nettype="SFNO",
        enable_synthetic_data=True,
        img_shape_x=16,
        img_shape_y=32,
        scale_factor=2,
        embed_dim=12,
        num_layers=2,
        channel_names=["u10m", "v10m", "t2m"],
        in_channels=[0, 1, 2],
        out_channels=[0, 1, 2],
        n_history=0,
        n_future=0,
        dt=1,
        dhours=6,
        add_zenith=True,
        batch_size=8,
        n_train_samples_per_epoch=8,
        n_eval_samples=8,
        valid_autoreg_steps=2,
        metric_names=["rmse", "acc", "l1"],
        losses=[{"type": "l2", "channel_weights": "constant"}],
        lr=1e-3,
        max_epochs=1,
        scheduler="none",
        optimizer_type="Adam",
        normalization_layer="instance_norm_s2",
        save_checkpoint="none",
        exp_dir=str(tmp_path),
    )
    base.update(over)
    return ParamsBase(base)


def test_validate_one_epoch_matches_manual_rollout(tmp_path):
    from makani_tpu.utils.training.deterministic_trainer import Trainer

    t = Trainer(_params(tmp_path))
    logs = t.validate_one_epoch()

    S = 3  # valid_autoreg_steps + 1
    C = 3
    quad = GridQuadrature("naive", img_shape=(16, 32), normalize=True)

    # independent re-rollout over the same loader (synthetic loader is
    # deterministic per epoch index; validate does not advance train state)
    sums = {m: np.zeros((S, C)) for m in ("rmse", "acc", "l1")}
    counts = np.zeros(S, np.int64)
    step_losses = []
    for batch in t.valid_loader:
        inp, tar, zen = t._put_batch(batch)
        x = inp
        batch_losses = []
        for s in range(S):
            zwin = None if zen is None else zen[:, s : s + 1]
            pred = t._eval_step(t.model_params, x, zwin)
            tstep = tar[:, s * C : (s + 1) * C]
            sums["rmse"][s] += np.asarray(weighted_rmse(pred, tstep, quad)).sum(0)
            sums["acc"][s] += np.asarray(weighted_acc(pred, tstep, quad)).sum(0)
            sums["l1"][s] += np.asarray(weighted_l1(pred, tstep, quad)).sum(0)
            counts[s] += pred.shape[0]
            batch_losses.append(float(t.loss_obj(pred, tstep, train=False)))
            if s < S - 1:
                x = t.preprocessor.append_history(x, pred, s)
        step_losses.append(np.mean(batch_losses))

    assert counts.min() == 8  # every step scored every eval sample
    for m in ("rmse", "acc", "l1"):
        curve = sums[m] / counts[:, None]
        for s in range(S):
            np.testing.assert_allclose(
                logs[f"{m}_rollout/{s}"], curve[s].mean(), rtol=2e-5, atol=1e-7,
                err_msg=f"{m} step {s}",
            )
        np.testing.assert_allclose(logs[m], curve[0].mean(), rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(logs[f"{m}_rollout_last"], curve[-1].mean(), rtol=2e-5, atol=1e-7)
        # per-channel keys at first and last step
        for c, name in enumerate(["u10m", "v10m", "t2m"]):
            np.testing.assert_allclose(logs[f"{m}/{name}"], curve[0, c], rtol=2e-5, atol=1e-7)
            np.testing.assert_allclose(logs[f"{m}_final/{name}"], curve[-1, c], rtol=2e-5, atol=1e-7)

    np.testing.assert_allclose(logs["valid_loss"], np.mean(step_losses), rtol=2e-5, atol=1e-7)

    # the rollout must actually degrade (autoregressive drift on an untrained
    # model): step-2 rmse above step-0 rmse guards against scoring the same
    # step thrice
    assert logs["rmse_rollout/2"] > logs["rmse_rollout/0"]


def test_validate_with_history_window(tmp_path):
    """n_history=1: the zenith window slides by one step per rollout step and
    targets still align — pins the T-offset indexing (ref stepper window)."""
    from makani_tpu.utils.training.deterministic_trainer import Trainer

    t = Trainer(_params(tmp_path, n_history=1, valid_autoreg_steps=1))
    logs = t.validate_one_epoch()

    S, C, T = 2, 3, 2
    quad = GridQuadrature("naive", img_shape=(16, 32), normalize=True)
    sums = np.zeros((S, C))
    counts = np.zeros(S, np.int64)
    for batch in t.valid_loader:
        inp, tar, zen = t._put_batch(batch)
        x = inp
        for s in range(S):
            zwin = None if zen is None else zen[:, s : s + T]
            pred = t._eval_step(t.model_params, x, zwin)
            tstep = tar[:, s * C : (s + 1) * C]
            sums[s] += np.asarray(weighted_rmse(pred, tstep, quad)).sum(0)
            counts[s] += pred.shape[0]
            if s < S - 1:
                x = t.preprocessor.append_history(x, pred, s)
    curve = sums / counts[:, None]
    for s in range(S):
        np.testing.assert_allclose(logs[f"rmse_rollout/{s}"], curve[s].mean(), rtol=2e-5, atol=1e-7)
