"""Member-chunked ensemble fold equivalence.

``ensemble_fold_chunk=c`` runs the folded (B*E) forward as a rematerialized
scan over E/c member chunks — the single-chip answer to ensemble sizes whose
full-resolution encoder hidden cannot coexist for all members (the measured
E=16 OOM at 0.5 deg, PERF.md round 5). The probabilistic loss still sees the
full (B, E, ...) ensemble, so loss AND gradients must match the plain fold
exactly; only the activation peak changes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.model_registry import get_model
from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.loss import LossHandler
from makani_tpu.utils.yparams import ParamsBase

B, E, C, H, W = 2, 4, 5, 16, 32
NAMES = ["u10m", "v10m", "t2m", "z500", "q700"]


def _params(**over):
    base = dict(
        nettype="SFNO",
        img_shape_x=H,
        img_shape_y=W,
        scale_factor=2,
        embed_dim=8,
        num_layers=2,
        channel_names=list(NAMES),
        in_channels=list(range(C)),
        out_channels=list(range(C)),
        n_history=0,
        n_future=0,
        add_zenith=True,
        ensemble_size=E,
        input_noise={
            "type": "diffusion",
            "mode": "concatenate",
            "n_channels": 2,
            "centered": True,
            "sigma": 1.0,
            "lambd": 1.0,
        },
        losses=[{"type": "crps", "channel_weights": "constant", "parameters": {"crps_type": "skillspread"}}],
    )
    base.update(over)
    return ParamsBase(base)


def _chunked_loss(model, loss_obj, chunk, x, z, tar):
    n_chunks = E // chunk

    def to_chunks(t):
        t = t.reshape(B, n_chunks, chunk, *t.shape[1:])
        t = jnp.swapaxes(t, 0, 1)
        return t.reshape(n_chunks, B * chunk, *t.shape[3:])

    def fn(q):
        @jax.checkpoint
        def body(_, xz):
            xi, zi = xz
            return None, model.apply(q, xi, zi, train=True)

        _, preds = jax.lax.scan(body, None, (to_chunks(x), to_chunks(z)))
        preds = preds.reshape(n_chunks, B, chunk, *preds.shape[2:])
        pred = jnp.swapaxes(preds, 0, 1).reshape(B, E, *preds.shape[3:])
        return loss_obj(pred, tar, train=True)

    return fn


@pytest.mark.parametrize("chunk", [1, 2])
def test_chunked_fold_matches_plain(chunk):
    params = _params()
    model, _ = get_model(params, multistep=True)
    loss_obj = LossHandler(params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.repeat(rng.randn(B, C, H, W).astype(np.float32), E, 0))
    z = jnp.asarray(rng.randn(B * E, 1, 3, H, W).astype(np.float32))
    tar = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x, z)

    def plain(q):
        pred = model.apply(q, x, z, train=True).reshape(B, E, C, H, W)
        return loss_obj(pred, tar, train=True)

    l_plain, g_plain = jax.value_and_grad(plain)(p)
    l_chunk, g_chunk = jax.value_and_grad(_chunked_loss(model, loss_obj, chunk, x, z, tar))(p)

    np.testing.assert_allclose(float(l_chunk), float(l_plain), atol=1e-6)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_chunk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_trainer_accepts_fold_chunk(tmp_path):
    """EnsembleTrainer with ensemble_fold_chunk trains a finite epoch and
    rejects chunk sizes that do not divide E."""
    from makani_tpu.utils.training.ensemble_trainer import EnsembleTrainer

    common = dict(
        enable_synthetic_data=True,
        batch_size=8,
        n_train_samples_per_epoch=8,
        n_eval_samples=8,
        valid_autoreg_steps=0,
        metric_names=["rmse", "crps", "ssr"],
        lr=1e-3,
        max_epochs=1,
        scheduler="none",
        optimizer_type="Adam",
        save_checkpoint="none",
        exp_dir=str(tmp_path),
        dt=1,
        dhours=6,
    )
    t = EnsembleTrainer(_params(ensemble_fold_chunk=2, **common))
    logs = t.train()
    assert np.isfinite(logs[0]["train_loss"])
    pmesh.cleanup()

    with pytest.raises(ValueError):
        EnsembleTrainer(_params(ensemble_fold_chunk=3, **common))._build_ens_train_step()
    pmesh.cleanup()
