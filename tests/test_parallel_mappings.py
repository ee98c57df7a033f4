"""Collective primitive tests (ref makani tests/distributed/
tests_distributed_layers.py pattern): shard_map collectives vs serial, with
gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from makani_tpu.parallel import mesh as pmesh
from makani_tpu.parallel.mappings import (
    copy_to_parallel_region,
    distributed_transpose,
    gather_from_parallel_region,
    reduce_from_parallel_region,
    scatter_to_parallel_region,
)


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def test_collectives_and_grads():
    mesh = pmesh.init(h=4, batch=2, devices=jax.devices())
    x = np.random.RandomState(0).randn(2, 8, 16).astype(np.float32)

    def body(v):
        # gather the sharded dim, reduce a copy, scatter back
        full = gather_from_parallel_region(v, 1, "h")  # (2, 8, 16) full
        s = reduce_from_parallel_region(jnp.sum(full), "h") / 4.0
        w = scatter_to_parallel_region(full, 1, "h")
        return w + 0 * s

    f = jax.shard_map(body, mesh=mesh, in_specs=P("batch", "h", None), out_specs=P("batch", "h", None), check_vma=False)
    out = np.asarray(f(x))
    np.testing.assert_allclose(out, x, atol=1e-6)

    # gradient flows through gather/scatter as identity
    g = jax.grad(lambda v: jnp.sum(f(v) ** 2))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), 2 * x, atol=1e-5)


def test_distributed_transpose_roundtrip():
    mesh = pmesh.init(w=4, batch=2, devices=jax.devices())
    x = np.random.RandomState(1).randn(2, 8, 16).astype(np.float32)

    def body(v):
        # exchange shard dim: channels <-> last dim, and back
        t = distributed_transpose(v, split_dim=1, concat_dim=2, axis_name="w")
        return distributed_transpose(t, split_dim=2, concat_dim=1, axis_name="w")

    f = jax.shard_map(body, mesh=mesh, in_specs=P("batch", None, "w"), out_specs=P("batch", None, "w"), check_vma=False)
    np.testing.assert_allclose(np.asarray(f(x)), x, atol=1e-6)


def test_copy_to_parallel_region_grad():
    mesh = pmesh.init(h=4, batch=2, devices=jax.devices())
    x = np.random.RandomState(2).randn(2, 4).astype(np.float32)

    def body(v):
        c = copy_to_parallel_region(v, "h")
        # each of the 4 h-shards contributes; backward must psum over h
        return reduce_from_parallel_region(jnp.sum(c**2, axis=1), "h")

    f = jax.shard_map(body, mesh=mesh, in_specs=P("batch", None), out_specs=P("batch"), check_vma=False)

    def loss(v):
        return jnp.sum(f(v))

    g = jax.grad(loss)(jnp.asarray(x))
    # forward: sum over 4 identical copies -> grad = 4 * 2x
    np.testing.assert_allclose(np.asarray(g), 8 * x, rtol=1e-5)
