"""Constraints, model packages, stochastic interpolant, autoencoder trainer."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.yparams import ParamsBase
from tests.testutils import get_default_parameters, init_hdf5_dataset


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def test_nonnegative_constraint():
    from makani_tpu.utils.constraints import NonNegativeConstraint

    names = ["t2m", "q500", "q700"]
    bias = np.array([0.0, 1.0, 2.0]).reshape(1, 3, 1, 1)
    scale = np.array([1.0, 2.0, 4.0]).reshape(1, 3, 1, 1)
    c = NonNegativeConstraint(names, ["q500", "q700"], bias=bias, scale=scale)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 8, 16).astype(np.float32) * 3)
    y_eval = np.asarray(c(x, train=False))
    # physical values of clamped channels are >= 0: x_phys = x*scale + bias
    phys = y_eval[:, 1:] * scale[0, 1:] + bias[0, 1:]
    assert (phys >= -1e-5).all()
    # unclamped channel untouched
    np.testing.assert_allclose(y_eval[:, 0], np.asarray(x)[:, 0])
    # training mode is smooth and close to identity for large positive values
    y_tr = np.asarray(c(x, train=True))
    big = np.asarray(x)[:, 1:] > 1.0
    np.testing.assert_allclose(y_tr[:, 1:][big], np.asarray(x)[:, 1:][big], atol=1e-2)


def test_hydrostatic_balance_projection():
    from makani_tpu.utils.constraints import HydrostaticBalanceProjection

    names = ["z500", "z700", "z850", "t500", "t700", "t850", "t2m"]
    hb = HydrostaticBalanceProjection(names, p_min=50, p_max=900)

    x = jnp.asarray(np.random.RandomState(1).randn(2, 7, 4, 8).astype(np.float32) * 100)
    y = np.asarray(hb(x))
    # after projection the hydrostatic residual vanishes
    import numpy as _np

    RD, G = 287.0528, 9.80665
    z = y[:, :3]
    t = y[:, 3:6]
    levels = [500, 700, 850]
    for l in range(2):
        dlnp = _np.log(levels[l + 1] / levels[l])
        resid = z[:, l + 1] - z[:, l] + 0.5 * (RD / G) * dlnp * (t[:, l] + t[:, l + 1])
        assert _np.abs(resid).max() < 1e-2, _np.abs(resid).max()
    # unrelated channel untouched
    np.testing.assert_allclose(y[:, 6], np.asarray(x)[:, 6])
    # projection is idempotent
    y2 = np.asarray(hb(jnp.asarray(y)))
    np.testing.assert_allclose(y2, y, atol=1e-3)


def test_constraints_wrapper_in_registry():
    from makani_tpu.models.model_registry import get_model

    params = ParamsBase(
        dict(
            nettype="SFNO",
            img_shape_x=16,
            img_shape_y=32,
            scale_factor=2,
            embed_dim=16,
            num_layers=2,
            channel_names=["t2m", "q500", "q700"],
            in_channels=[0, 1, 2],
            out_channels=[0, 1, 2],
            n_history=0,
            n_future=0,
            add_zenith=False,
            normalization_layer="none",
            constraints=[{"type": "nonnegative"}],
        )
    )
    model, pre = get_model(params, multistep=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16, 32)) * 3
    p = model.init(jax.random.PRNGKey(1), x)
    y = np.asarray(model.apply(p, x, deterministic=True))
    assert (y[:, 1:] >= -1e-5).all()


def test_model_package_roundtrip(tmp_path):
    from makani_tpu.models.model_package import load_model_package, save_model_package
    from makani_tpu.models.model_registry import get_model

    paths = init_hdf5_dataset(tmp_path)
    params = get_default_parameters(tmp_path, **paths)
    model, pre = get_model(params, multistep=True)
    H, W = 16, 32
    x = jnp.zeros((1, 5, H, W))
    zen = jnp.zeros((1, 1, 1, H, W))
    p = model.init(jax.random.PRNGKey(0), x, zen)

    pkg_dir = os.path.join(str(tmp_path), "package")
    save_model_package(params, p, pkg_dir)
    assert os.path.isfile(os.path.join(pkg_dir, "config.yaml"))

    wrapper = load_model_package(pkg_dir)
    rng = np.random.RandomState(0)
    xin = jnp.asarray(rng.randn(1, 5, H, W).astype(np.float32))
    y = wrapper(xin, jnp.zeros((1, 1, 1, H, W)))
    assert y.shape == (1, 5, H, W)
    assert np.isfinite(np.asarray(y)).all()

    # identical weights: direct apply (normalized space) matches wrapper modulo normalization
    bias, scale = wrapper.bias, wrapper.scale
    xn = (xin - bias) / scale
    y_direct = model.apply(p, xn, jnp.zeros((1, 1, 1, H, W)), train=False)
    np.testing.assert_allclose(np.asarray((y - bias[:, :5]) / scale[:, :5]), np.asarray(y_direct), atol=1e-4)


def test_stochastic_trainer(tmp_path):
    from makani_tpu.utils.training.stochastic_trainer import StochasticTrainer

    params = get_default_parameters(
        tmp_path,
        enable_synthetic_data=True,
        batch_size=8,
        n_train_samples_per_epoch=8,
        n_eval_samples=8,
        n_sde_steps=3,
        max_epochs=1,
        save_checkpoint="none",
    )
    t = StochasticTrainer(params)
    logs = t.train()
    assert np.isfinite(logs[0]["train_loss"])
    assert np.isfinite(logs[0]["valid_loss"])


def test_autoencoder_trainer(tmp_path):
    from makani_tpu.utils.training.autoencoder_trainer import AutoencoderTrainer

    params = get_default_parameters(
        tmp_path,
        enable_synthetic_data=True,
        batch_size=8,
        n_train_samples_per_epoch=8,
        n_eval_samples=8,
        valid_autoreg_steps=0,
        max_epochs=1,
        save_checkpoint="none",
    )
    t = AutoencoderTrainer(params)
    logs = t.train()
    assert np.isfinite(logs[0]["train_loss"])


def test_wb2_layout_roundtrip():
    from makani_tpu.utils.dataloaders.wb2_helpers import from_wb2_layout, to_wb2_layout, wb2_variable_name

    assert wb2_variable_name("z500") == ("geopotential", 500)
    assert wb2_variable_name("t2m") == ("2m_temperature", None)

    names = ["u10m", "t2m", "z500", "z850", "t500", "t850"]
    rng = np.random.RandomState(0)
    fields = rng.randn(3, len(names), 8, 16).astype(np.float32)
    wb2 = to_wb2_layout(fields, names)
    assert wb2["geopotential"].shape == (3, 2, 8, 16)
    back = from_wb2_layout(wb2, names)
    np.testing.assert_allclose(back, fields)


def test_driver_defaults_and_shapes():
    from makani_tpu.utils.driver import derive_data_shapes, set_default_parameters

    params = ParamsBase(dict(channel_names=["u10m", "v10m", "t2m"], add_zenith=True, n_history=1))
    set_default_parameters(params)
    derive_data_shapes(params)
    assert params["N_in_channels"] == 2 * (3 + 1)  # (hist+1) * (prog + zenith)
    assert params["N_out_channels"] == 3


def test_count_parameters():
    from makani_tpu.models.helpers import count_parameters

    tree = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5)}}
    assert count_parameters(tree) == 17


def test_visualization_wrapper(tmp_path):
    import os

    from makani_tpu.utils.visualize import VisualizationWrapper

    vw = VisualizationWrapper(str(tmp_path), ["u10m", "v10m"])
    rng = np.random.RandomState(0)
    vw.add_comparison(rng.randn(2, 8, 16), rng.randn(2, 8, 16), "u10m", tag="t")
    vw.add_video(rng.randn(3, 2, 8, 16), "v10m")
    out = vw.finalize()
    assert len(out) == 2 and all(os.path.isfile(p) for p in out)


def test_training_helpers(tmp_path):
    import jax

    from makani_tpu.utils.training.training_helpers import dump_weights_and_grads, memory_usage, total_grad_norm

    p = {"a": {"w": np.ones((2, 2), np.float32)}}
    g = {"a": {"w": 2 * np.ones((2, 2), np.float32)}}
    f = dump_weights_and_grads(str(tmp_path), p, g, step=3)
    data = np.load(f)
    assert "weights/a/w" in data and "grads/a/w" in data
    np.testing.assert_allclose(float(total_grad_norm(g)), 4.0)
    assert isinstance(memory_usage(), dict)


def test_experiment_logger(tmp_path):
    import json

    from makani_tpu.utils.logging_utils import ExperimentLogger

    el = ExperimentLogger(str(tmp_path), config={"lr": 1e-3, "nettype": "SFNO"})
    el.log({"train_loss": 0.5, "skip_me": object()}, step=1)
    el.log({"train_loss": 0.4}, step=2)
    el.finish()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(rows) == 2 and rows[1]["train_loss"] == 0.4 and rows[0]["step"] == 1
    assert "skip_me" not in rows[0]
    cfg = json.load(open(tmp_path / "config.json"))
    assert cfg["nettype"] == "SFNO"


def test_alpha_schedules():
    from makani_tpu.utils.losses.base_loss import compute_alpha_per_step

    a = compute_alpha_per_step(3, schedule="linear", alpha_min=0.0, alpha_max=1.0)
    np.testing.assert_allclose(a, [0, 1 / 3, 2 / 3, 1.0], atol=1e-6)
    s = compute_alpha_per_step(3, schedule="sigmoid")
    assert s.shape == (4,) and (np.diff(s) > 0).all()
    annealed = compute_alpha_per_step(3, training_progress=0.5, annealing="quadratic")
    np.testing.assert_allclose(annealed, a * 0.25, atol=1e-6)


def test_entrypoint_model_discovery(monkeypatch):
    """Third-party models registered under the makani_tpu.models entry-point
    group appear in the registry (ref pyproject.toml makani.models group)."""
    from makani_tpu.models import model_registry as mr

    class FakeEP:
        name = "MyExternalNet"
        value = "makani_tpu.models.networks.debug:DebugNet"

    monkeypatch.setattr(mr, "_REGISTRY", dict(mr._REGISTRY) if mr._REGISTRY else {})
    real_eps = mr._load_entrypoint_models

    def fake_eps():
        mr._REGISTRY.setdefault(FakeEP.name, FakeEP.value)

    monkeypatch.setattr(mr, "_load_entrypoint_models", fake_eps)
    mr._REGISTRY.clear()
    mr._populate()
    assert "MyExternalNet" in mr.list_models()
    handle = mr.get_model_handle("MyExternalNet")
    from makani_tpu.models.networks.debug import DebugNet

    assert handle is DebugNet
