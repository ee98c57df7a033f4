"""Tensor-parallel ("matmul" axis) parity tests: Megatron-style column/row
sharding rules vs serial execution (ref makani/mpu/layers.py distributed
layers; here a pure sharding assignment — see parallel/sharding_rules.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.models.model_registry import get_model
from makani_tpu.parallel import mesh as pmesh
from makani_tpu.parallel.sharding_rules import infer_param_partition_spec
from makani_tpu.utils.yparams import ParamsBase


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


CONFIGS = {
    "SFNO": dict(
        nettype="SFNO", img_shape_x=16, img_shape_y=32, scale_factor=2, embed_dim=16,
        num_layers=2, operator_type="dhconv", normalization_layer="instance_norm",
    ),
    "ViT": dict(
        nettype="ViT", img_shape_x=16, img_shape_y=32, patch_size=[4, 4], embed_dim=32,
        num_layers=2, num_heads=4,
    ),
    "AFNO": dict(
        nettype="AFNO", img_shape_x=16, img_shape_y=32, patch_size=[4, 4], embed_dim=32,
        num_layers=2, num_blocks=4,
    ),
}


@pytest.mark.parametrize("nettype", list(CONFIGS))
def test_tp_matmul_parity(nettype):
    cfg = dict(
        CONFIGS[nettype],
        channel_names=["a", "b"],
        in_channels=[0, 1],
        out_channels=[0, 1],
        n_history=0,
        n_future=0,
        add_zenith=False,
    )
    m, _ = get_model(ParamsBase(dict(cfg)), multistep=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 2, 16, 32).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    y0 = m.apply(p, x)

    mesh = pmesh.init(matmul=4, batch=2)
    specs = infer_param_partition_spec(p)
    pd = jax.device_put(p, jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs))
    xd = jax.device_put(x, NamedSharding(mesh, P(("batch", "ensemble"), None, "h", "w")))
    y1 = jax.jit(m.apply)(pd, xd)
    err = float(jnp.abs(y1 - y0).max()) / float(jnp.abs(y0).max())
    assert err < 1e-5, f"{nettype}: TP4 rel err {err}"
