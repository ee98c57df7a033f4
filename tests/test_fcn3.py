"""FCN3/SNO model tests: shapes, grads, registry integration, water clamping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.model_registry import get_model
from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.yparams import ParamsBase

NAMES = ["u500", "t500", "q500", "u850", "t850", "q850", "t2m", "msl", "tcwv"]


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def make_params(nettype, **overrides):
    base = dict(
        nettype=nettype,
        img_shape_x=24,
        img_shape_y=48,
        scale_factor=2,
        embed_dim=16,
        atmo_embed_dim=8,
        surf_embed_dim=8,
        aux_embed_dim=4,
        num_layers=2,
        sfno_block_frequency=2,
        kernel_shape=(2, 2),
        encoder_kernel_shape=(2, 2),
        channel_names=list(NAMES),
        in_channels=list(range(len(NAMES))),
        out_channels=list(range(len(NAMES))),
        n_history=0,
        n_future=0,
        add_zenith=True,
        clamp_water=True,
        normalization_layer="instance_norm",
        losses=[{"type": "l2"}],
        multistep={"push_forward": False},
    )
    base.update(overrides)
    return ParamsBase(base)


@pytest.mark.parametrize("nettype", ["FCN3", "SNO"])
def test_forward_backward(nettype):
    params = make_params(nettype)
    model, pre = get_model(params, multistep=False)

    B, C, H, W = 2, len(NAMES), 24, 48
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C, H, W))
    zen = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 1, H, W))
    p = model.init(jax.random.PRNGKey(0), x, zen)

    y = model.apply(p, x, zen)
    assert y.shape == (B, C, H, W)
    assert np.isfinite(np.asarray(y)).all()

    g = jax.grad(lambda q: jnp.mean(model.apply(q, x, zen) ** 2))(p)
    gn = float(jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b * b), jax.tree.leaves(g), 0.0)) ** 0.5
    assert np.isfinite(gn) and gn > 0


def test_fcn3_water_clamp_nonnegative():
    """With zero normalization offset, clamped water channels must be >= 0."""
    params = make_params("FCN3")
    model, pre = get_model(params, multistep=False)
    B, C, H, W = 2, len(NAMES), 24, 48
    x = jax.random.normal(jax.random.PRNGKey(3), (B, C, H, W)) * 3
    zen = jnp.zeros((B, 1, 1, H, W))
    p = model.init(jax.random.PRNGKey(0), x, zen)
    y = np.asarray(model.apply(p, x, zen))
    from makani_tpu.utils.features import get_water_channels

    widx = get_water_channels(NAMES)
    assert (y[:, widx] >= -1e-6).all()


def test_fcn3_ensemble_training(tmp_path):
    from makani_tpu.utils.training.ensemble_trainer import EnsembleTrainer

    params = make_params(
        "FCN3",
        enable_synthetic_data=True,
        batch_size=4,
        ensemble_size=2,
        ensemble_parallel_size=2,
        dt=1,
        dhours=6,
        input_noise={"type": "diffusion", "n_channels": 2, "mode": "concatenate", "centered": True, "sigma": 1.0, "lambd": 0.5},
        n_train_samples_per_epoch=4,
        n_eval_samples=4,
        valid_autoreg_steps=1,
        losses=[{"type": "crps", "channel_weights": "constant", "parameters": {"crps_type": "skillspread"}}],
        metric_names=["rmse", "crps", "ssr"],
        lr=1e-3,
        max_epochs=1,
        scheduler="none",
        optimizer_type="Adam",
        save_checkpoint="none",
        exp_dir=str(tmp_path),
    )
    t = EnsembleTrainer(params)
    logs = t.train()
    assert np.isfinite(logs[0]["train_loss"])
    assert np.isfinite(logs[0]["crps"])


def test_fcn3_spatial_distributed_parity():
    """FCN3 under an h2w2 spatial mesh matches the serial forward: the DISCO
    convolutions' halo exchanges are derived by GSPMD from the shardings (the
    TPU-native replacement for the reference's explicit distributed DISCO)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from makani_tpu.models.model_registry import get_model
    from makani_tpu.parallel.sharding_rules import infer_param_partition_spec

    cfg = dict(
        nettype="FCN3",
        img_shape_x=24,
        img_shape_y=48,
        scale_factor=2,
        embed_dim=16,
        num_layers=2,
        channel_names=["u10m", "v10m", "t2m", "q700"],
        in_channels=[0, 1, 2, 3],
        out_channels=[0, 1, 2, 3],
        n_history=0,
        n_future=0,
        add_zenith=False,
    )
    m, _ = get_model(ParamsBase(dict(cfg)), multistep=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 24, 48).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    y_serial = m.apply(p, x)

    pmesh.cleanup()
    mesh = pmesh.init(h=2, w=2)
    md, _ = get_model(ParamsBase(dict(cfg)), multistep=False)
    specs = infer_param_partition_spec(p)
    pd = jax.device_put(p, jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs))
    xd = jax.device_put(x, NamedSharding(mesh, P(("batch", "ensemble"), None, "h", "w")))
    y_dist = jax.jit(md.apply)(pd, xd)
    err = float(jnp.abs(y_dist - y_serial).max()) / float(jnp.abs(y_serial).max())
    assert err < 1e-5


def test_fcn3_decoder_emits_no_resample_all_gather():
    """Census regression (PERF.md round 4): under a spatial mesh the decoder
    resampling must ride the halo shard_map — the only all-gathers allowed
    under a decoder op_name are the DISCO polar-row gathers inside the conv
    shard_map (irreducible: the near-pole window spans all longitudes).
    Without the halo resample, GSPMD all-gathers the whole internal-grid
    field in front of every decoder."""
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from makani_tpu.models.model_registry import get_model
    from makani_tpu.parallel.sharding_rules import infer_param_partition_spec

    cfg = dict(
        nettype="FCN3",
        img_shape_x=24,
        img_shape_y=48,
        scale_factor=2,
        embed_dim=16,
        num_layers=2,
        channel_names=["u10m", "v10m", "t2m", "q700"],
        in_channels=[0, 1, 2, 3],
        out_channels=[0, 1, 2, 3],
        n_history=0,
        n_future=0,
        add_zenith=False,
    )
    pmesh.cleanup()
    mesh = pmesh.init(h=2, w=2)
    try:
        m, _ = get_model(ParamsBase(dict(cfg)), multistep=False)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 24, 48).astype(np.float32))
        shapes = jax.eval_shape(lambda k: m.init(k, x), jax.random.PRNGKey(0))
        specs = infer_param_partition_spec(shapes)
        p = jax.jit(m.init, out_shardings=jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs))(
            jax.random.PRNGKey(0), x
        )
        xd = jax.device_put(x, NamedSharding(mesh, P(("batch", "ensemble"), None, "h", "w")))
        hlo = jax.jit(m.apply).lower(p, xd).compile().as_text()
        offenders = []
        for line in hlo.splitlines():
            if not re.search(r"\ball-gather\(", line):
                continue
            nm = re.search(r'op_name="([^"]*)"', line)
            op = nm.group(1) if nm else ""
            if "decoder" in op and "shard_map" not in op:
                offenders.append(op)
        assert not offenders, f"decoder field all-gathers reappeared: {offenders}"
    finally:
        pmesh.cleanup()
