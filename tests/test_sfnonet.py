"""SFNO/FNO model tests: shapes, gradients, distributed parity.

Mirrors the reference's test_models.py (fwd/bwd shape+grad checks) and
tests/distributed/tests_distributed_model.py (serial-vs-distributed parity).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.models.networks.sfnonet import (
    FourierNeuralOperatorNet,
    SphericalFourierNeuralOperatorNet,
)
from makani_tpu.parallel import mesh as pmesh

KW = dict(
    inp_shape=(24, 48),
    out_shape=(24, 48),
    scale_factor=2,
    inp_chans=5,
    out_chans=5,
    embed_dim=16,
    num_layers=3,
)


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


@pytest.mark.parametrize(
    "cls,norm,filter_type,operator_type",
    [
        (SphericalFourierNeuralOperatorNet, "instance_norm", "linear", "dhconv"),
        (SphericalFourierNeuralOperatorNet, "instance_norm_s2", "linear", "diagonal"),
        (SphericalFourierNeuralOperatorNet, "layer_norm", "non-linear", "diagonal"),
        (FourierNeuralOperatorNet, "instance_norm", "linear", "diagonal"),
    ],
)
def test_forward_backward_shapes(cls, norm, filter_type, operator_type):
    model = cls(normalization_layer=norm, filter_type=filter_type, operator_type=operator_type, **KW)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 24, 48))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 5, 24, 48)
    assert np.isfinite(np.asarray(y)).all()

    g = jax.grad(lambda p: jnp.mean(model.apply(p, x) ** 2))(params)
    gnorm = float(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b * b), jax.tree.leaves(g), 0.0)) ** 0.5
    assert np.isfinite(gnorm) and gnorm > 0.0


@pytest.mark.parametrize("pos_embed", ["direct", "frequency"])
def test_pos_embeddings(pos_embed):
    model = SphericalFourierNeuralOperatorNet(pos_embed=pos_embed, **KW)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 24, 48))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 5, 24, 48)


def test_distributed_matches_serial():
    """Serial params, sharded eval over h=2 x w=2 x batch=2: same output."""
    kw = dict(KW, inp_shape=(25, 48), out_shape=(25, 48), normalization_layer="instance_norm_s2")
    model = SphericalFourierNeuralOperatorNet(**kw)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2, 5, 25, 48)), np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_ser = np.asarray(model.apply(params, jnp.asarray(x)))

    mesh = pmesh.init(h=2, w=2)
    dmodel = SphericalFourierNeuralOperatorNet(**kw)
    xpad = np.concatenate([x, np.zeros((2, 5, 1, 48), np.float32)], axis=2)
    xs = jax.device_put(xpad, NamedSharding(mesh, P(("batch", "ensemble"), None, "h", "w")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    y_dist = np.asarray(jax.jit(lambda p, v: dmodel.apply(p, v))(ps, xs))

    assert y_dist.shape == (2, 5, 26, 48)
    np.testing.assert_allclose(y_dist[..., :25, :], y_ser, atol=1e-4)


def test_distributed_gradients_match_serial():
    kw = dict(KW, inp_shape=(25, 48), out_shape=(25, 48), normalization_layer="instance_norm_s2", num_layers=2)
    model = SphericalFourierNeuralOperatorNet(**kw)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2, 5, 25, 48)), np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def loss_ser(p):
        return jnp.mean(model.apply(p, jnp.asarray(x)) ** 2)

    g_ser = jax.grad(loss_ser)(params)

    mesh = pmesh.init(h=2, w=2)
    dmodel = SphericalFourierNeuralOperatorNet(**kw)
    xpad = np.concatenate([x, np.zeros((2, 5, 1, 48), np.float32)], axis=2)
    xs = jax.device_put(xpad, NamedSharding(mesh, P(("batch", "ensemble"), None, "h", "w")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))

    def loss_dist(p, v):
        y = dmodel.apply(p, v)
        # restrict the loss to physical rows so both losses match
        return jnp.mean(y[..., :25, :] ** 2)

    g_dist = jax.jit(jax.grad(loss_dist))(ps, xs)

    flat_ser = jax.tree_util.tree_leaves_with_path(g_ser)
    flat_dist = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_dist)}
    for k, v in flat_ser:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(flat_dist[key]), np.asarray(v), atol=2e-5, err_msg=key)


@pytest.mark.parametrize("policy", ["dots", "full", "save_transforms", "save_transforms_stats"])
def test_remat_policy_value_and_grad_parity(policy):
    """Selective remat (dots_saveable / full block remat) must be a pure
    scheduling choice: values and gradients identical to the no-remat net."""
    base = SphericalFourierNeuralOperatorNet(**KW)
    remat = SphericalFourierNeuralOperatorNet(remat_policy=policy, **KW)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 24, 48))
    params = base.init(jax.random.PRNGKey(0), x)

    y0 = base.apply(params, x)
    y1 = remat.apply(params, x)
    # recompute reassociates fp ops; only scheduling may differ, not math
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)

    g0 = jax.grad(lambda p: jnp.mean(base.apply(p, x) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.mean(remat.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
