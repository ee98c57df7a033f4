"""CRPS kernels vs the analytic Gaussian closed form (ref test_losses.py
validates its CRPS kernels against properscoring; properscoring's own
reference is this closed form, Gneiting & Raftery 2007):

    CRPS(N(mu, sigma), y) = sigma * [ z (2 Phi(z) - 1) + 2 phi(z) - 1/sqrt(pi) ],
    z = (y - mu) / sigma.

A large N(0,1) ensemble must converge to it for every kernel, and the
kernels must agree with each other on small ensembles (same estimator up to
the documented spread normalization).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy.stats import norm

from makani_tpu.utils.losses.crps_loss import crps_ensemble


def crps_gaussian(y, mu=0.0, sigma=1.0):
    z = (y - mu) / sigma
    return sigma * (z * (2 * norm.cdf(z) - 1) + 2 * norm.pdf(z) - 1.0 / np.sqrt(np.pi))


@pytest.mark.parametrize("crps_type", ["cdf", "skillspread", "probability weighted moment", "gauss"])
@pytest.mark.parametrize("y", [-1.3, 0.0, 0.7, 2.5])
def test_kernels_converge_to_gaussian_closed_form(crps_type, y):
    rng = np.random.default_rng(0)
    E = 5000
    ens = jnp.asarray(rng.standard_normal(E).astype(np.float32))[None, :]
    obs = jnp.asarray(np.asarray([y], np.float32))
    got = float(np.asarray(crps_ensemble(obs, ens, crps_type=crps_type)).reshape(()))
    want = crps_gaussian(y)
    # the gauss kernel scores N(mean, std) fitted to the ensemble — exact for
    # a Gaussian ensemble; the empirical kernels carry O(1/E) bias
    tol = 0.03 if crps_type != "gauss" else 0.02
    assert abs(got - want) < tol, (crps_type, y, got, want)


def test_kernel_estimator_conventions():
    """cdf integrates the empirical CDF (the biased 1/E^2 estimator);
    pwm and skillspread are the fair 1/(E(E-1)) estimator — pinned against
    the pairwise |X - X'| closed forms."""
    rng = np.random.default_rng(1)
    E = 7
    ens = rng.standard_normal((4, E)).astype(np.float32)
    obs = rng.standard_normal(4).astype(np.float32)
    term1 = np.mean(np.abs(ens - obs[:, None]), axis=1)
    pair = np.abs(ens[:, :, None] - ens[:, None, :]).sum(axis=(1, 2))

    cdf = np.asarray(crps_ensemble(jnp.asarray(obs), jnp.asarray(ens), crps_type="cdf"))
    np.testing.assert_allclose(cdf, term1 - pair / (2 * E * E), atol=1e-5)

    for t in ("probability weighted moment", "skillspread"):
        fair = np.asarray(crps_ensemble(jnp.asarray(obs), jnp.asarray(ens), crps_type=t))
        np.testing.assert_allclose(fair, term1 - pair / (2 * E * (E - 1)), atol=1e-5)


def test_skillspread_alpha_tempers_spread_normalization():
    """alpha interpolates the spread normalization between the biased
    (alpha=0: 1/E^2) and fair (alpha=1: 1/(E(E-1))) estimators — the
    reference's tempered-CRPS schedule (compute_alpha_per_step)."""
    rng = np.random.default_rng(2)
    E = 9
    ens = rng.standard_normal((3, E)).astype(np.float32)
    obs = rng.standard_normal(3).astype(np.float32)
    term1 = np.mean(np.abs(ens - obs[:, None]), axis=1)
    pair = np.abs(ens[:, :, None] - ens[:, None, :]).sum(axis=(1, 2))

    a0 = np.asarray(crps_ensemble(jnp.asarray(obs), jnp.asarray(ens), crps_type="skillspread", alpha=0.0))
    np.testing.assert_allclose(a0, term1 - pair / (2 * E * E), atol=1e-5)
    a1 = np.asarray(crps_ensemble(jnp.asarray(obs), jnp.asarray(ens), crps_type="skillspread", alpha=1.0))
    np.testing.assert_allclose(a1, term1 - pair / (2 * E * (E - 1)), atol=1e-5)
    # monotone in alpha (more spread subtracted as alpha rises)
    ah = np.asarray(crps_ensemble(jnp.asarray(obs), jnp.asarray(ens), crps_type="skillspread", alpha=0.5))
    assert np.all(a1 <= ah + 1e-7) and np.all(ah <= a0 + 1e-7)


def test_crps_zero_for_point_ensemble_on_obs():
    obs = jnp.asarray(np.asarray([0.4, -1.2], np.float32))
    ens = jnp.repeat(obs[:, None], 6, axis=1)
    for t in ("cdf", "skillspread", "probability weighted moment"):
        got = np.asarray(crps_ensemble(obs, ens, crps_type=t))
        np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_crps_gradient_flows_to_forecasts():
    rng = np.random.default_rng(3)
    ens = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    obs = jnp.asarray(rng.standard_normal(2).astype(np.float32))
    g = jax.grad(lambda e: jnp.sum(crps_ensemble(obs, e, crps_type="skillspread")))(ens)
    assert np.all(np.isfinite(np.asarray(g))) and np.abs(np.asarray(g)).max() > 0
