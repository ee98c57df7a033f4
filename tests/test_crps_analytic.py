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


def test_kernels_match_exact_pairwise_enumeration():
    """Exact finite-E identity (not asymptotic): fair CRPS =
    mean|x_i - y| - sum_{i,j}|x_i - x_j| / (2 E (E-1)), and the biased (cdf /
    naive alpha=(E-1)/E) variant divides by 2 E^2. Pins every kernel against
    a dense fp64 O(E^2) enumeration on random data."""
    from makani_tpu.utils.losses.crps_loss import crps_ensemble

    rng = np.random.RandomState(42)
    E = 7
    obs = rng.randn(3, 4)
    ens = rng.randn(3, 4, E)

    skill = np.abs(ens - obs[..., None]).mean(axis=-1)
    pair = np.abs(ens[..., :, None] - ens[..., None, :]).sum(axis=(-2, -1))
    fair = skill - pair / (2 * E * (E - 1))
    biased = skill - pair / (2 * E * E)

    for crps_type, expect in [
        ("skillspread", fair),
        ("naive skillspread", fair),
        ("probability weighted moment", fair),
        ("cdf", biased),
    ]:
        got = np.asarray(crps_ensemble(jnp.asarray(obs), jnp.asarray(ens), crps_type))
        np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-6, err_msg=crps_type)

    # the alpha knob interpolates the fairness correction (E-1+alpha):
    # alpha=0 reproduces the biased (cdf) estimator exactly
    got = np.asarray(crps_ensemble(jnp.asarray(obs), jnp.asarray(ens), "skillspread", alpha=0.0))
    np.testing.assert_allclose(got, biased, rtol=2e-5, atol=2e-6)


def test_energy_score_matches_exact_pairwise_enumeration():
    """L2 energy score vs dense pairwise fp64 enumeration (fair form)."""
    from makani_tpu.utils.losses.energy_score import LpEnergyScoreLoss

    H, W, E, C = 9, 16, 5, 2
    names = ["u10m", "v10m"]
    loss = LpEnergyScoreLoss(img_shape=(H, W), channel_names=names, grid_type="equiangular", p=2.0)

    rng = np.random.RandomState(3)
    fc = rng.randn(1, E, C, H, W).astype(np.float64)
    ob = rng.randn(1, C, H, W).astype(np.float64)

    got = np.asarray(loss(jnp.asarray(fc, jnp.float32), jnp.asarray(ob, jnp.float32)))

    # quadrature-weighted L2 norm over the sphere, per channel
    from makani_tpu.utils.grids import GridQuadrature

    quad = GridQuadrature("naive", img_shape=(H, W), normalize=True)
    qw = np.asarray(quad.quad_weight).reshape(H, W)

    def norm(d):  # (C, H, W) -> (C,)
        return np.sqrt((d**2 * qw).sum(axis=(-2, -1)))

    skill = np.stack([norm(fc[0, i] - ob[0]) for i in range(E)]).mean(axis=0)
    pair = np.zeros(C)
    for i in range(E):
        for j in range(E):
            pair += norm(fc[0, i] - fc[0, j])
    fair = skill - pair / (2 * E * (E - 1))
    biased = skill - pair / (2 * E * E)
    # accept either estimator convention, but it must match one exactly
    err_fair = np.abs(np.asarray(got).reshape(-1)[:C] - fair).max()
    err_biased = np.abs(np.asarray(got).reshape(-1)[:C] - biased).max()
    assert min(err_fair, err_biased) < 5e-5, (got, fair, biased)
