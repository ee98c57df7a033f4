"""FCN3.1 parity features (ref fourcastnet3_1.py:55-1177): sine activation,
lmax-based DISCO cutoffs, learned SST imputation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from makani_tpu.models.model_registry import get_model
from makani_tpu.utils.yparams import ParamsBase

NAMES = ["u10m", "v10m", "t2m", "sst", "z500", "q500"]


def _params(**over):
    cfg = dict(
        nettype="FCN3.1",
        img_shape_x=16,
        img_shape_y=32,
        scale_factor=2,
        atmo_embed_dim=4,
        surf_embed_dim=6,
        aux_embed_dim=4,
        num_layers=2,
        kernel_shape=[2, 3],
        channel_names=NAMES,
        in_channels=list(range(len(NAMES))),
        out_channels=list(range(len(NAMES))),
        n_history=0,
        n_future=0,
        add_zenith=True,
        losses=[{"type": "l2"}],
        lr=1e-3,
        optimizer_type="Adam",
        scheduler="none",
        multistep={"push_forward": False},
    )
    cfg.update(over)
    return ParamsBase(cfg)


def test_fcn31_imputes_nan_sst_and_runs():
    model, _ = get_model(_params(), multistep=True)
    rng = np.random.RandomState(0)
    x = rng.randn(1, len(NAMES), 16, 32).astype(np.float32)
    x[:, NAMES.index("sst"), :8, :] = np.nan  # land half
    xj = jnp.asarray(x)
    zen = jnp.asarray(rng.randn(1, 1, 1, 16, 32).astype(np.float32))

    p = model.init(jax.random.PRNGKey(0), xj, zen)
    names_p = [jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(p)[0]]
    assert any("sst_imputation" in n for n in names_p)

    out = model.apply(p, xj, zen, train=False)
    assert bool(jnp.isfinite(out).all())

    # gradients flow through the imputation (trainable end-to-end with NaNs)
    g = jax.grad(lambda q: jnp.mean(model.apply(q, xj, zen, train=True) ** 2))(p)
    gmax = max(float(jnp.abs(le).max()) for le in jtu.tree_leaves(g))
    assert np.isfinite(gmax) and gmax > 0


def test_fcn31_no_sst_channel_skips_imputation():
    names = [n for n in NAMES if n != "sst"]
    model, _ = get_model(
        _params(channel_names=names, in_channels=list(range(len(names))), out_channels=list(range(len(names)))),
        multistep=True,
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, len(names), 16, 32).astype(np.float32))
    zen = jnp.asarray(rng.randn(1, 1, 1, 16, 32).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x, zen)
    names_p = [jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(p)[0]]
    assert not any("sst_imputation" in n for n in names_p)
    assert bool(jnp.isfinite(model.apply(p, x, zen, train=False)).all())


def test_mlp_imputation_preserves_valid_data():
    from makani_tpu.models.common.imputation import MLPImputation

    imp = MLPImputation(inp_chans=3, impute_chans=(1,))
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 8, 16).astype(np.float32)
    x[:, 1, :4] = np.nan
    xj = jnp.asarray(x)
    p = imp.init(jax.random.PRNGKey(0), xj)
    y = np.asarray(imp.apply(p, xj))
    assert np.isfinite(y).all()
    # valid positions untouched
    np.testing.assert_array_equal(y[:, 1, 4:], x[:, 1, 4:])
    np.testing.assert_array_equal(y[:, 0], x[:, 0])
    np.testing.assert_array_equal(y[:, 2], x[:, 2])
