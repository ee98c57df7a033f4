"""0.25-degree (721x1440) viability on the 8-device virtual mesh (slow).

VERDICT r1 item 3: the full resolution had never been executed. These tests
run the actual 721x1440 grid — uneven 721-lat padding over h=2, full-size
Legendre tables, full-size DISCO psi precompute — with small embed dims so
CPU compile+execute stays tractable. The per-chip memory envelope of the
flagship config is measured separately on hardware (PERF.md "0.25 deg").
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.parallel import mesh as pmesh

FULL = (721, 1440)


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


@pytest.mark.slow
def test_sfno_fullres_sharded_forward():
    """SFNO at 0.25 deg on a (h=2, w=2, batch=2) mesh: the padded-721 path,
    full-size Legendre tables, distributed transforms."""
    mesh = pmesh.init(h=2, w=2, batch=2)
    from makani_tpu.models.networks.sfnonet import SphericalFourierNeuralOperatorNet as SFNO

    t0 = time.time()
    model = SFNO(
        inp_shape=FULL,
        out_shape=FULL,
        scale_factor=6,
        inp_chans=3,
        out_chans=3,
        embed_dim=8,
        num_layers=2,
        operator_type="dhconv",
        normalization_layer="instance_norm",
        big_skip=True,
    )
    B, H, W = 2, FULL[0], FULL[1]
    Hp = H + (-H) % 2
    x = jnp.zeros((B, 3, Hp, W), jnp.float32)
    data_sharding = NamedSharding(mesh, P("batch", None, "h", "w"))
    x = jax.device_put(np.random.RandomState(0).randn(B, 3, Hp, W).astype(np.float32), data_sharding)

    params = model.init(jax.random.PRNGKey(0), x)
    t_init = time.time() - t0

    t0 = time.time()
    out = jax.jit(lambda p, v: model.apply(p, v))(params, x)
    out.block_until_ready()
    t_fwd = time.time() - t0

    assert out.shape == (B, 3, Hp, W)
    assert bool(jnp.isfinite(out).all())
    # sanity ceilings: table precompute and one jit at 0.25 deg must not blow up
    assert t_init < 600, f"init/tables took {t_init:.0f}s"
    assert t_fwd < 900, f"fullres compile+fwd took {t_fwd:.0f}s"


@pytest.mark.slow
def test_fcn3_fullres_disco_precompute_and_forward():
    """FCN3 at 0.25 deg: DISCO psi precompute at 721x1440 (the compile-scaling
    risk flagged in VERDICT r1) plus one serial forward."""
    from makani_tpu.models.model_registry import get_model
    from makani_tpu.utils.yparams import ParamsBase

    names = ["u10m", "v10m", "t2m", "u500", "v500", "z500"]
    params_cfg = ParamsBase(
        dict(
            nettype="FCN3",
            img_shape_x=FULL[0],
            img_shape_y=FULL[1],
            scale_factor=6,
            atmo_embed_dim=2,
            surf_embed_dim=3,
            aux_embed_dim=2,
            num_layers=2,
            kernel_shape=[3, 3],
            channel_names=names,
            in_channels=list(range(len(names))),
            out_channels=list(range(len(names))),
            n_history=0,
            n_future=0,
            add_zenith=True,
            losses=[{"type": "l2"}],
            lr=1e-3,
            optimizer_type="Adam",
            scheduler="none",
            multistep={"push_forward": False},
        )
    )
    t0 = time.time()
    model, _ = get_model(params_cfg, multistep=True)
    x = jnp.asarray(np.random.RandomState(0).randn(1, len(names), *FULL), jnp.float32)
    zen = jnp.asarray(np.random.RandomState(1).randn(1, 1, 1, *FULL), jnp.float32)
    p = model.init(jax.random.PRNGKey(0), x, zen)
    t_init = time.time() - t0

    t0 = time.time()
    out = model.apply(p, x, zen, train=False)
    out_np = np.asarray(out)
    t_fwd = time.time() - t0

    assert out_np.shape[-2:] == FULL
    assert np.isfinite(out_np).all()
    assert t_init < 900, f"FCN3 init/psi precompute took {t_init:.0f}s"
    assert t_fwd < 1200, f"FCN3 fullres fwd took {t_fwd:.0f}s"
