"""Uniform distributed-vs-serial parity matrix across registry nettypes.

Mirrors the reference's per-nettype distributed model test
(tests/distributed/tests_distributed_model.py:225): run the factory model
serially on the full tensor, then shard params/inputs over a mesh carving and
assert forward outputs AND parameter gradients agree to fp32 tolerance.

Complements the per-model parity tests that already exist (SFNO h2w2 in
test_sfnonet.py, FCN3 h2w2 in test_fcn3.py, ViT/AFNO/SFNO matmul in
test_tensor_parallel.py) by covering the remaining registry families —
FNO/SNO/FCN3.1 under the spatial h x w carving, AFNOv2 under tensor
parallelism, Pangu under sharded-batch data parallelism — through the same
GSPMD path the trainers use (infer_param_partition_spec + NamedSharding).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.models.model_registry import get_model
from makani_tpu.parallel import mesh as pmesh
from makani_tpu.parallel.sharding_rules import infer_param_partition_spec
from makani_tpu.utils.yparams import ParamsBase

FCN_NAMES = ["u10m", "v10m", "t2m", "q700"]


def _cfg(nettype, **over):
    base = dict(
        nettype=nettype,
        img_shape_x=24,
        img_shape_y=48,
        scale_factor=2,
        embed_dim=16,
        num_layers=2,
        channel_names=list(FCN_NAMES),
        in_channels=[0, 1, 2, 3],
        out_channels=[0, 1, 2, 3],
        n_history=0,
        n_future=0,
        add_zenith=False,
    )
    base.update(over)
    return base


# nettype -> (config overrides, mesh carving)
MATRIX = {
    "FNO": (dict(), dict(h=2, w=2)),
    "SNO": (dict(aux_embed_dim=4), dict(h=2, w=2)),
    "FCN3.1": (
        dict(
            embed_dim=8,
            aux_embed_dim=4,
            pos_embed_dim=3,
            encoder_bias=False,
            filter_basis_type="harmonic",
            filter_basis_norm_mode="nodal",
            activation_function="sin",
            kernel_shape=[2, 3],
        ),
        dict(h=2, w=2),
    ),
    "AFNOv2": (
        dict(img_shape_x=16, img_shape_y=32, patch_size=[4, 4], embed_dim=32, num_blocks=4),
        dict(matmul=2),  # batch auto-sizes to 4
    ),
    "Pangu": (
        dict(
            img_shape_x=16,
            img_shape_y=32,
            channel_names=["t2m", "msl", "u500", "t500", "u850", "t850"],
            in_channels=list(range(6)),
            out_channels=list(range(6)),
            patch_size=(2, 4, 4),
            window_size=(2, 2, 4),
            embed_dim=16,
            num_heads=4,
        ),
        dict(batch=8),
    ),
}


def _grad_leaves(tree):
    return {jtu.keystr(k): np.asarray(v) for k, v in jtu.tree_flatten_with_path(tree)[0]}


@pytest.mark.parametrize("nettype", sorted(MATRIX))
def test_distributed_matches_serial(nettype):
    over, carving = MATRIX[nettype]
    cfg = _cfg(nettype, **over)

    pmesh.cleanup()
    m, _ = get_model(ParamsBase(dict(cfg)), multistep=False)
    C = len(cfg["channel_names"])
    H, W = cfg["img_shape_x"], cfg["img_shape_y"]
    rng = np.random.RandomState(0)
    nb = max(4, carving.get("batch") or 0)
    x = jnp.asarray(rng.randn(nb, C, H, W).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)

    y_serial = m.apply(p, x)
    g_serial = jax.grad(lambda q: jnp.mean(m.apply(q, x) ** 2))(p)

    pmesh.cleanup()
    mesh = pmesh.init(**carving)
    md, _ = get_model(ParamsBase(dict(cfg)), multistep=False)
    specs = infer_param_partition_spec(p)
    pd = jax.device_put(p, jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs))
    xd = jax.device_put(x, NamedSharding(mesh, P(("batch", "ensemble"), None, "h", "w")))

    y_dist = jax.jit(md.apply)(pd, xd)
    scale = float(jnp.abs(y_serial).max())
    err = float(jnp.abs(y_dist - y_serial).max()) / scale
    assert err < 2e-5, f"{nettype} forward rel err {err:.2e}"

    g_dist = jax.jit(jax.grad(lambda q, v: jnp.mean(md.apply(q, v) ** 2)))(pd, xd)
    ref, got = _grad_leaves(g_serial), _grad_leaves(g_dist)
    assert set(ref) == set(got)
    for k in ref:
        tol = 2e-5 * max(1.0, float(np.abs(ref[k]).max()))
        np.testing.assert_allclose(got[k], ref[k], atol=tol, err_msg=f"{nettype} {k}")
    pmesh.cleanup()
