"""Registry-driven model tests (ref makani tests/test_models.py:66-123):
forward/backward shape and finiteness checks for every registered model
through the full get_model factory (preprocessor + stepper wrappers).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.model_registry import get_model, list_models
from makani_tpu.utils.yparams import ParamsBase


def make_params(nettype, **overrides):
    base = dict(
        nettype=nettype,
        img_shape_x=24,
        img_shape_y=48,
        scale_factor=2,
        embed_dim=16,
        num_layers=2,
        num_heads=4,
        num_blocks=4,
        patch_size=(4, 4),
        channel_names=["u10m", "v10m", "t2m", "z500", "q700"],
        in_channels=[0, 1, 2, 3, 4],
        out_channels=[0, 1, 2, 3, 4],
        n_history=0,
        n_future=0,
        add_zenith=True,
        normalization_layer="instance_norm_s2",
        losses=[{"type": "l2"}],
        multistep={"push_forward": False},
    )
    base.update(overrides)
    return ParamsBase(base)


TESTABLE = ["SFNO", "FNO", "AFNO", "AFNOv2", "ViT", "DebugNet", "Pangu"]

OVERRIDES = {
    "Pangu": dict(
        channel_names=["t2m", "msl", "u500", "t500", "u850", "t850"],
        in_channels=list(range(6)),
        out_channels=list(range(6)),
        patch_size=(2, 4, 4),
        window_size=(2, 3, 6),
    ),
}


@pytest.mark.parametrize("nettype", TESTABLE)
def test_forward_backward(nettype):
    params = make_params(nettype, **OVERRIDES.get(nettype, {}))
    model, pre = get_model(params, multistep=False)

    C = len(params.get("channel_names"))
    B, H, W = 2, 24, 48
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C, H, W))
    zen = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 1, H, W))
    p = model.init(jax.random.PRNGKey(0), x, zen)

    y = model.apply(p, x, zen)
    assert y.shape == (B, C, H, W)
    assert np.isfinite(np.asarray(y)).all()

    g = jax.grad(lambda q: jnp.mean(model.apply(q, x, zen) ** 2))(p)
    gn = float(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b * b), jax.tree.leaves(g), 0.0)) ** 0.5
    assert np.isfinite(gn)


@pytest.mark.parametrize("nettype", ["SFNO", "AFNO"])
def test_multistep_wrapper(nettype):
    params = make_params(nettype, n_future=2)
    model, pre = get_model(params, multistep=True)

    B, C, H, W = 2, 5, 24, 48
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C, H, W))
    zen = jax.random.normal(jax.random.PRNGKey(2), (B, 3, 1, H, W))
    p = model.init(jax.random.PRNGKey(0), x, zen)

    y = model.apply(p, x, zen, train=True)
    assert y.shape == (B, 15, H, W)
    y_eval = model.apply(p, x, zen, train=False)
    assert y_eval.shape == (B, 5, H, W)
    # eval output must equal the first training rollout step
    np.testing.assert_allclose(np.asarray(y[:, :5]), np.asarray(y_eval), atol=1e-5)


def test_list_models():
    models = list_models()
    for m in ["SFNO", "FNO", "AFNO", "AFNOv2", "ViT", "DebugNet", "FCN3", "Pangu", "SNO"]:
        assert m in models
