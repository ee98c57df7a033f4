"""Probabilistic metrics under SPMD sharding (ref tests/distributed/
tests_distributed_metrics.py): the MetricsHandler must produce identical
results when its (B, E, C, H, W) inputs are sharded over the
ensemble x h x w mesh axes — the layout the EnsembleTrainer validates in —
as when everything sits replicated on one device. The CRPS member-sort runs
along a sharded-adjacent axis and the quadrature reduces over sharded
h/w; GSPMD must resolve both without changing a ULP beyond fp32 noise."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.metric import MetricsHandler
from makani_tpu.utils.yparams import ParamsBase

B, E, C, H, W = 2, 4, 3, 16, 32


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def _handler(metrics, steps=1):
    params = ParamsBase(
        dict(
            img_shape_x=H,
            img_shape_y=W,
            channel_names=[f"c{i}" for i in range(C)],
            metric_names=list(metrics),
            valid_autoreg_steps=steps - 1,
        )
    )
    return MetricsHandler(params)


@pytest.mark.parametrize("carving", [dict(ensemble=4, h=2), dict(ensemble=2, h=2, w=2)])
def test_ensemble_metrics_sharded_match_replicated(carving):
    rng = np.random.default_rng(0)
    prd = rng.standard_normal((B, E, C, H, W)).astype(np.float32)
    tar = rng.standard_normal((B, C, H, W)).astype(np.float32)

    metrics = ["rmse", "acc", "crps", "spread", "ssr", "rankhist"]
    h_serial = _handler(metrics)
    h_serial.update(jnp.asarray(prd), jnp.asarray(tar), step=0)
    logs_serial = h_serial.finalize()

    mesh = pmesh.init(**carving)
    h_dist = _handler(metrics)
    prd_d = jax.device_put(prd, NamedSharding(mesh, P("batch", "ensemble", None, "h", "w")))
    tar_d = jax.device_put(tar, NamedSharding(mesh, P("batch", None, "h", "w")))
    h_dist.update(prd_d, tar_d, step=0)
    logs_dist = h_dist.finalize()

    assert set(logs_serial) == set(logs_dist)
    for k, v in logs_serial.items():
        np.testing.assert_allclose(logs_dist[k], v, rtol=5e-5, atol=1e-6, err_msg=k)


def test_deterministic_metrics_sharded_match_replicated():
    rng = np.random.default_rng(1)
    prd = rng.standard_normal((4, C, H, W)).astype(np.float32)
    tar = rng.standard_normal((4, C, H, W)).astype(np.float32)

    h_serial = _handler(["rmse", "acc", "l1"])
    h_serial.update(jnp.asarray(prd), jnp.asarray(tar), step=0)
    logs_serial = h_serial.finalize()

    mesh = pmesh.init(h=2, w=2)
    h_dist = _handler(["rmse", "acc", "l1"])
    sh = NamedSharding(mesh, P(("batch", "ensemble"), None, "h", "w"))
    h_dist.update(jax.device_put(prd, sh), jax.device_put(tar, sh), step=0)
    logs_dist = h_dist.finalize()

    for k, v in logs_serial.items():
        np.testing.assert_allclose(logs_dist[k], v, rtol=5e-5, atol=1e-6, err_msg=k)


def test_masked_metrics_sharded_match_replicated():
    """The mask path (inferencer side-dataset) under spatial sharding."""
    rng = np.random.default_rng(2)
    prd = rng.standard_normal((2, C, H, W)).astype(np.float32)
    tar = rng.standard_normal((2, C, H, W)).astype(np.float32)
    mask = (rng.random((2, C, H, W)) > 0.3).astype(np.float32)

    h_serial = _handler(["rmse", "l1"])
    h_serial.update(jnp.asarray(prd), jnp.asarray(tar), step=0, mask=jnp.asarray(mask))
    logs_serial = h_serial.finalize()

    mesh = pmesh.init(h=2, w=2)
    h_dist = _handler(["rmse", "l1"])
    sh = NamedSharding(mesh, P(("batch", "ensemble"), None, "h", "w"))
    h_dist.update(
        jax.device_put(prd, sh), jax.device_put(tar, sh), step=0, mask=jax.device_put(mask, sh)
    )
    logs_dist = h_dist.finalize()
    for k, v in logs_serial.items():
        np.testing.assert_allclose(logs_dist[k], v, rtol=5e-5, atol=1e-6, err_msg=k)
