"""Distributed losses/metrics parity (ref tests/distributed/
tests_distributed_losses.py, tests_distributed_metrics.py): losses evaluated
on spatially/ensemble-sharded arrays must equal the serial values — under
pjit the quadrature partial sums and ensemble reductions are GSPMD-derived
from the shardings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.loss import LOSS_REGISTRY
from makani_tpu.utils.metric import MetricsHandler
from makani_tpu.utils.yparams import ParamsBase

NAMES = ["u500", "v500", "z500", "t500"]
SHAPE = (16, 32)
KW = dict(img_shape=SHAPE, channel_names=NAMES, grid_type="legendre-gauss")


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


@pytest.mark.parametrize(
    "key,ensemble",
    [
        ("l2", False),
        ("spectral l2", False),
        ("h1", False),
        ("crps", True),
        ("lp_energy_score", True),
        ("ensemble_nll", True),
    ],
)
def test_loss_sharded_vs_serial(key, ensemble):
    fn = LOSS_REGISTRY[key](**KW, squared=True)
    rng = np.random.RandomState(0)
    if ensemble:
        prd = jnp.asarray(rng.randn(4, 4, len(NAMES), *SHAPE).astype(np.float32))
        spec = P("batch", "ensemble", None, "h", "w")
    else:
        prd = jnp.asarray(rng.randn(4, len(NAMES), *SHAPE).astype(np.float32))
        spec = P("batch", None, "h", "w")
    tar = jnp.asarray(rng.randn(4, len(NAMES), *SHAPE).astype(np.float32))

    serial = np.asarray(fn(prd, tar))

    mesh = pmesh.init(h=2, ensemble=2 if ensemble else 1, batch=2, devices=jax.devices()[: (8 if ensemble else 4)])
    prd_d = jax.device_put(prd, NamedSharding(mesh, spec))
    tar_d = jax.device_put(tar, NamedSharding(mesh, P("batch", None, "h", "w")))
    dist = np.asarray(jax.jit(fn)(prd_d, tar_d))
    np.testing.assert_allclose(dist, serial, rtol=2e-5, atol=1e-6)


def test_metrics_sharded_vs_serial():
    params = ParamsBase(
        dict(img_shape_x=SHAPE[0], img_shape_y=SHAPE[1], channel_names=NAMES, valid_autoreg_steps=0, metric_names=["rmse", "acc", "crps", "spread", "rankhist"])
    )
    mh = MetricsHandler(params)
    rng = np.random.RandomState(1)
    ens = jnp.asarray(rng.randn(4, 4, len(NAMES), *SHAPE).astype(np.float32))
    tar = jnp.asarray(rng.randn(4, len(NAMES), *SHAPE).astype(np.float32))

    serial = {k: np.asarray(v) for k, v in mh.compute_batch(ens, tar).items()}

    mesh = pmesh.init(h=2, ensemble=2, batch=2)
    ens_d = jax.device_put(ens, NamedSharding(mesh, P("batch", "ensemble", None, "h", "w")))
    tar_d = jax.device_put(tar, NamedSharding(mesh, P("batch", None, "h", "w")))
    dist = {k: np.asarray(v) for k, v in jax.jit(mh.compute_batch)(ens_d, tar_d).items()}
    for k in serial:
        np.testing.assert_allclose(dist[k], serial[k], rtol=2e-5, atol=1e-6, err_msg=k)


def test_grad_accumulation_equivalence(tmp_path):
    """MultiSteps(k) over k micro-batches matches one step on the full batch
    (ref tests_distributed_model.py:379 gradient-accumulation test)."""
    import optax

    from makani_tpu.models.model_registry import get_model
    from makani_tpu.utils.training.optimizer import get_optimizer

    cfg = ParamsBase(
        dict(
            nettype="SFNO", img_shape_x=16, img_shape_y=32, scale_factor=2, embed_dim=16,
            num_layers=1, channel_names=["a", "b"], in_channels=[0, 1], out_channels=[0, 1],
            n_history=0, n_future=0, add_zenith=False, lr=1e-2, optimizer_type="SGD",
            scheduler="none", normalization_layer="instance_norm",
        )
    )
    m, _ = get_model(cfg, multistep=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 2, 16, 32).astype(np.float32))
    y = jnp.asarray(rng.randn(4, 2, 16, 32).astype(np.float32))
    p0 = m.init(jax.random.PRNGKey(0), x)

    def loss_fn(p, xb, yb):
        return jnp.mean(jnp.square(m.apply(p, xb) - yb))

    # full batch, single step
    tx_full, _ = get_optimizer(cfg, p0)
    s = tx_full.init(p0)
    g = jax.grad(loss_fn)(p0, x, y)
    u, s = tx_full.update(g, s, p0)
    p_full = optax.apply_updates(p0, u)

    # two micro-batches with accumulation
    cfg["grad_accumulation_steps"] = 2
    tx_acc, _ = get_optimizer(cfg, p0)
    s2 = tx_acc.init(p0)
    p_acc = p0
    for xb, yb in [(x[:2], y[:2]), (x[2:], y[2:])]:
        g2 = jax.grad(loss_fn)(p_acc, xb, yb)
        u2, s2 = tx_acc.update(g2, s2, p_acc)
        p_acc = optax.apply_updates(p_acc, u2)

    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
