"""Resume-exactness: interrupted training continues bit-for-bit.

The reference's checkpoint-restart recovery model (SURVEY §5; makani
tests/test_save_restore.py) demands that a save/restore cycle is invisible to
the optimization trajectory: training E epochs straight must equal training
one epoch, restarting the process from the checkpoint, and finishing. This
exercises model params, optimizer state (Adam moments), iteration counters,
and the scheduler position together — a drifting leaf in any of them shows
up as a parameter mismatch after the continuation epoch.
"""

import numpy as np
import pytest

import jax

from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.yparams import ParamsBase


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def _params(tmp_path, sub, **over):
    exp = tmp_path / sub
    exp.mkdir(parents=True, exist_ok=True)
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
        n_train_samples_per_epoch=16,
        n_eval_samples=8,
        valid_autoreg_steps=0,
        losses=[{"type": "l2", "channel_weights": "constant"}],
        lr=2e-3,
        max_epochs=2,
        # a schedule that changes lr every step: any lost scheduler/iteration
        # state after resume shifts the continuation trajectory
        scheduler="CosineAnnealingLR",
        scheduler_T_max=2,
        optimizer_type="Adam",
        weight_decay=0.01,
        normalization_layer="instance_norm_s2",
        save_checkpoint="flexible",
        exp_dir=str(exp),
    )
    base.update(over)
    return ParamsBase(base)


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_resume_matches_uninterrupted(tmp_path):
    from makani_tpu.utils.training.deterministic_trainer import Trainer

    # straight 2-epoch run
    t_full = Trainer(_params(tmp_path, "full"))
    logs_full = t_full.train()

    # interrupted run: 1 epoch, new process (new Trainer), then continue
    p1 = _params(tmp_path, "resume", max_epochs=1)
    Trainer(p1).train()

    p2 = _params(tmp_path, "resume", max_epochs=2)
    p2["resuming"] = True
    t_res = Trainer(p2)
    assert t_res.epoch == 1 and t_res.iters == 2  # 16 samples / batch 8
    logs_res = t_res.train()

    # the continuation epoch must reproduce the uninterrupted epoch exactly
    assert logs_res[-1]["epoch"] == 2
    np.testing.assert_allclose(
        logs_res[-1]["train_loss"], logs_full[-1]["train_loss"], rtol=1e-6
    )
    for a, b in zip(_leaves(t_full.model_params), _leaves(t_res.model_params)):
        np.testing.assert_allclose(a, b, atol=1e-7)
    # optimizer moments continued, not re-initialized
    for a, b in zip(_leaves(t_full.opt_state), _leaves(t_res.opt_state)):
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, atol=1e-7)
        else:
            assert (a == b).all()


def test_resume_restores_best_valid_tracking(tmp_path):
    from makani_tpu.utils.training.deterministic_trainer import Trainer

    p1 = _params(tmp_path, "best", max_epochs=1)
    t1 = Trainer(p1)
    t1.train()
    best1 = t1.best_valid_loss

    p2 = _params(tmp_path, "best", max_epochs=2)
    p2["resuming"] = True
    t2 = Trainer(p2)
    # best-checkpoint tracking must survive the restart (ref
    # deterministic_trainer.py:432-447)
    assert t2.best_valid_loss == best1
