"""Spherical noise statistics (ref tests/test_noise.py: spectra of random
fields). Pins the GRF's angular power-law spectrum against the analytic
sigma_l, the reflect (antithetic) convention, and the OU diffusion noise's
stationary variance and temporal decorrelation structure.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.noise import DiffusionNoiseS2, IsotropicGaussianRandomFieldS2
from makani_tpu.ops.sht import RealSHT

H, W = 32, 64


def _power_spectrum(fields):
    """Mean angular power per degree l of (N, H, W) fields via SHT analysis."""
    sht = RealSHT(H, W, grid="equiangular")
    c2 = np.asarray(sht.analysis(jnp.asarray(fields)))  # (N, lmax, mmax, 2)
    p2 = (c2**2).sum(-1)  # |c_lm|^2
    # one-sided m: double m>0 (real-field conjugate symmetry)
    p2[:, :, 1:] *= 2.0
    return p2.sum(-1).mean(0)  # (lmax,)


def test_grf_power_spectrum_matches_sigma_l():
    """Sampled angular power per l ~ (2l+1) sigma_l^2 (alpha-law)."""
    alpha = 2.0
    noise = IsotropicGaussianRandomFieldS2((H, W), num_channels=1, sigma=1.5, alpha=alpha, grid_type="equiangular")
    state = noise.init_state(jax.random.PRNGKey(0), 256)
    eta = np.asarray(noise.sample(state))[:, 0, 0]  # (256, H, W)

    spec = _power_spectrum(eta)
    sig = np.asarray(noise.sigma_l)[0, 0, 0, :, :, 0]  # (lmax, mmax)
    # expected power at l: sum_m (2 - delta_m0) sigma_l^2 / 2 (each of re/im
    # carries half the variance; the synthesis convention folds m>0 doubling)
    want = (sig**2).copy()
    want[:, 1:] *= 2.0
    want = want.sum(-1)
    sel = slice(1, 20)  # skip l=0 and the noisy tail
    ratio = spec[sel] / np.maximum(want[sel], 1e-30)
    assert np.all(np.abs(np.log(ratio)) < 0.35), ratio  # within ~40% per l at N=256
    # the power law slope: power(l) decays ~ l^(-alpha) relative to (2l+1)
    ls = np.arange(H)[sel]
    slope = np.polyfit(np.log(ls), np.log(spec[sel] / (2 * ls + 1.0)), 1)[0]
    assert abs(slope - (-alpha)) < 0.35, slope


def test_grf_reflect_is_antithetic():
    base = IsotropicGaussianRandomFieldS2((H, W), num_channels=2, sigma=1.0, alpha=1.0)
    refl = IsotropicGaussianRandomFieldS2((H, W), num_channels=2, sigma=1.0, alpha=1.0, reflect=True)
    s0 = base.init_state(jax.random.PRNGKey(7), 4)
    s1 = refl.init_state(jax.random.PRNGKey(7), 4)
    np.testing.assert_allclose(np.asarray(base.sample(s0)), -np.asarray(refl.sample(s1)), atol=1e-6)


def test_grf_zero_alpha_white_spectrum():
    """alpha=0: flat per-mode power -> per-l power proportional to (2l+1)."""
    noise = IsotropicGaussianRandomFieldS2((H, W), num_channels=1, sigma=1.0, alpha=0.0)
    state = noise.init_state(jax.random.PRNGKey(1), 256)
    eta = np.asarray(noise.sample(state))[:, 0, 0]
    spec = _power_spectrum(eta)
    sel = slice(1, 24)
    ls = np.arange(H)[sel]
    norm = spec[sel] / (2 * ls + 1.0)
    assert norm.max() / norm.min() < 2.2, norm  # flat within sampling noise


def test_diffusion_noise_stationary_and_decorrelating():
    """OU state: update() preserves the marginal std (stationarity) and the
    lag-k correlation decreases with k."""
    noise = DiffusionNoiseS2((24, 48), num_channels=1, num_time_steps=1, sigma=1.0, lambd=2.0)
    assert noise.is_stateful()
    key = jax.random.PRNGKey(3)
    state = noise.init_state(key, 128)
    samples = [np.asarray(noise.sample(state))]
    for i in range(6):
        key, sub = jax.random.split(key)
        state = noise.update(state, sub)
        samples.append(np.asarray(noise.sample(state)))
    stds = [s.std() for s in samples]
    assert max(stds) / min(stds) < 1.25, stds

    flat = [s.reshape(-1) for s in samples]
    corr1 = np.corrcoef(flat[0], flat[1])[0, 1]
    corr5 = np.corrcoef(flat[0], flat[5])[0, 1]
    assert corr1 > corr5, (corr1, corr5)
    assert corr1 > 0.1
