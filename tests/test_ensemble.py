"""Probabilistic stack tests: noise statistics, CRPS kernels, ensemble trainer.

Mirrors the reference's test_noise.py (spectra/variance of random fields) and
test_losses.py CRPS coverage (vs the analytic Gaussian CRPS and
properscoring-equivalent identities).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.noise import DiffusionNoiseS2, IsotropicGaussianRandomFieldS2
from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.grids import GridQuadrature
from makani_tpu.utils.losses.crps_loss import crps_ensemble
from makani_tpu.utils.yparams import ParamsBase


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def test_isotropic_grf_variance():
    """Spatial variance of the field should match sigma^2."""
    # alpha=0 (flat spectrum): the m=0 imaginary component is discarded by the
    # real synthesis (both here and in the reference), which biases the
    # variance low by ~ sum_l sigma_l^2/2; with a flat spectrum that bias is
    # O(1/lmax) and the sigma^2 normalization is testable.
    noise = IsotropicGaussianRandomFieldS2((32, 64), num_channels=1, sigma=2.0, alpha=0.0, grid_type="equiangular")
    state = noise.init_state(jax.random.PRNGKey(0), 64)
    eta = np.asarray(noise.sample(state))  # (64, 1, 1, 32, 64)
    quad = GridQuadrature("naive", (32, 64), normalize=True)
    var = float(np.mean(np.asarray(quad(jnp.asarray(eta**2)))))
    assert abs(var - 4.0) / 4.0 < 0.15, var


def test_diffusion_noise_autocorrelation():
    """OU process: corr(x_t, x_{t+1}) ~ exp(-lambd)."""
    lambd = 0.5
    noise = DiffusionNoiseS2((24, 48), num_channels=1, lambd=lambd, sigma=1.0, grid_type="equiangular")
    key = jax.random.PRNGKey(1)
    state = noise.init_state(key, 128)
    keys = jax.random.split(key, 8)
    fields = [np.asarray(noise.sample(state))[:, 0, 0]]
    for k in keys:
        state = noise.update(state, k, replace_state=False)
        fields.append(np.asarray(noise.sample(state))[:, 0, 0])
    x = np.stack(fields)  # (T, B, H, W)
    num = np.mean(x[:-1] * x[1:])
    den = np.mean(x**2)
    corr = num / den
    assert abs(corr - np.exp(-lambd)) < 0.1, corr


def test_diffusion_stationary_variance():
    """replace_state draws from the stationary distribution: unit variance for
    sigma=1 regardless of lambd."""
    noise = DiffusionNoiseS2((24, 48), num_channels=1, lambd=0.3, sigma=1.5, grid_type="equiangular")
    state = noise.init_state(jax.random.PRNGKey(2), 128)
    eta = np.asarray(noise.sample(state))
    quad = GridQuadrature("naive", (24, 48), normalize=True)
    var = float(np.mean(np.asarray(quad(jnp.asarray(eta**2)))))
    assert abs(var - 1.5**2) / 1.5**2 < 0.2, var


def test_crps_gaussian_analytic():
    """Large Gaussian ensembles approach the analytic Gaussian CRPS."""
    rng = np.random.RandomState(0)
    E = 2048
    obs = np.array(0.3)
    ens = rng.randn(E).astype(np.float32)

    # analytic CRPS for N(0,1) observation y
    from scipy.stats import norm

    y = float(obs)
    analytic = y * (2 * norm.cdf(y) - 1) + 2 * norm.pdf(y) - 1 / np.sqrt(np.pi)

    for kind in ["cdf", "skillspread", "probability weighted moment", "naive skillspread", "gauss"]:
        val = float(crps_ensemble(jnp.asarray(obs), jnp.asarray(ens), crps_type=kind))
        assert abs(val - analytic) < 0.02, (kind, val, analytic)


def test_crps_kernels_agree():
    """fair estimators (skillspread/pwm/naive/cdf-ish) agree on small ensembles."""
    rng = np.random.RandomState(1)
    obs = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    ens = jnp.asarray(rng.randn(4, 3, 8).astype(np.float32))
    a = np.asarray(crps_ensemble(obs, ens, "skillspread", alpha=1.0))
    b = np.asarray(crps_ensemble(obs, ens, "naive skillspread", alpha=1.0))
    c = np.asarray(crps_ensemble(obs, ens, "probability weighted moment"))
    np.testing.assert_allclose(a, b, atol=1e-5)
    np.testing.assert_allclose(a, c, atol=1e-5)


def test_crps_ensemble_axis_equivalence():
    """crps_ensemble(ensemble_axis=k) == the default trailing-axis call, value
    AND gradient — pins the E-first layout rewrite (the TPU lane-padding fix)
    against the reference-ordered formulation."""
    import jax

    rng = np.random.RandomState(7)
    obs = jnp.asarray(rng.randn(2, 3, 4, 6).astype(np.float32))
    ens_bechw = jnp.asarray(rng.randn(2, 5, 3, 4, 6).astype(np.float32))  # (B,E,C,H,W)
    ens_last = jnp.moveaxis(ens_bechw, 1, -1)
    for kind in ["cdf", "skillspread", "naive skillspread", "probability weighted moment", "gauss"]:
        f_ax = lambda e: jnp.sum(crps_ensemble(obs, e, kind, alpha=0.7, ensemble_axis=1))
        f_def = lambda e: jnp.sum(crps_ensemble(obs, e, kind, alpha=0.7))
        v1, g1 = jax.value_and_grad(f_ax)(ens_bechw)
        v2, g2 = jax.value_and_grad(f_def)(ens_last)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6, err_msg=kind)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(jnp.moveaxis(g2, -1, 1)), atol=1e-6, err_msg=kind)


def test_ensemble_trainer(tmp_path):
    from makani_tpu.utils.training.ensemble_trainer import EnsembleTrainer

    params = ParamsBase(
        dict(
            nettype="SFNO",
            enable_synthetic_data=True,
            img_shape_x=24,
            img_shape_y=48,
            scale_factor=2,
            embed_dim=16,
            num_layers=2,
            channel_names=["u10m", "v10m", "t2m", "z500", "q700"],
            in_channels=[0, 1, 2, 3, 4],
            out_channels=[0, 1, 2, 3, 4],
            n_history=0,
            n_future=0,
            dt=1,
            dhours=6,
            add_zenith=True,
            batch_size=8,
            ensemble_size=2,
            input_noise={"type": "diffusion", "n_channels": 2, "mode": "concatenate", "centered": True, "sigma": 1.0, "lambd": 0.5},
            n_train_samples_per_epoch=8,
            n_eval_samples=8,
            valid_autoreg_steps=1,
            losses=[{"type": "crps", "channel_weights": "constant", "parameters": {"crps_type": "skillspread"}}],
            metric_names=["rmse", "acc", "crps", "spread", "ssr"],
            lr=1e-3,
            max_epochs=1,
            scheduler="none",
            optimizer_type="Adam",
            normalization_layer="instance_norm_s2",
            save_checkpoint="none",
            exp_dir=str(tmp_path),
            multistep={"push_forward": False},
        )
    )
    t = EnsembleTrainer(params)
    logs = t.train()
    assert np.isfinite(logs[0]["train_loss"])
    assert np.isfinite(logs[0]["valid_loss"])
    assert "crps" in logs[0] and "spread" in logs[0] and "ssr" in logs[0]


def test_ensemble_trainer_perturb_mode(tmp_path):
    """Input-noise 'perturb' mode: noise added to selected channels, no extra
    input channels (ref preprocessor.py:176-179, 449-456)."""
    from makani_tpu.utils.training.ensemble_trainer import EnsembleTrainer

    params = ParamsBase(
        dict(
            nettype="SFNO",
            enable_synthetic_data=True,
            img_shape_x=24,
            img_shape_y=48,
            scale_factor=2,
            embed_dim=16,
            num_layers=2,
            channel_names=["u10m", "v10m", "t2m", "z500", "q700"],
            in_channels=[0, 1, 2, 3, 4],
            out_channels=[0, 1, 2, 3, 4],
            n_history=0,
            n_future=0,
            dt=1,
            dhours=6,
            add_zenith=True,
            batch_size=8,
            ensemble_size=2,
            input_noise={
                "type": "white",
                "mode": "perturb",
                "perturb_channels": ["u10m", "v10m", "t2m"],
                "sigma": 0.1,
                "alpha": 2.0,
            },
            n_train_samples_per_epoch=8,
            n_eval_samples=8,
            valid_autoreg_steps=0,
            losses=[{"type": "crps", "channel_weights": "constant", "parameters": {"crps_type": "skillspread"}}],
            metric_names=["rmse", "crps", "spread"],
            lr=1e-3,
            max_epochs=1,
            scheduler="none",
            optimizer_type="Adam",
            normalization_layer="instance_norm",
            save_checkpoint="none",
            exp_dir=str(tmp_path),
            multistep={"push_forward": False},
        )
    )
    t = EnsembleTrainer(params)
    assert list(t.preprocessor.perturb_channels) == [0, 1, 2]
    logs = t.train()
    assert np.isfinite(logs[0]["train_loss"])
    # members differ (noise actually applied): spread > 0
    assert logs[0]["spread"] > 0
