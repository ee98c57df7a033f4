"""Multi-time-step noise structure (ref tests/test_noise.py temporal
sections): the Toeplitz-discounted OU trajectory's phi^|dt| time
correlation, AR-step state rolling, per-channel parameter broadcasting, the
stateful/stateless protocol, and the build_noise factory dispatch.
"""

import numpy as np

import jax
import jax.numpy as jnp

from makani_tpu.models.noise import (
    DiffusionNoiseS2,
    DummyNoiseS2,
    IsotropicGaussianRandomFieldS2,
    build_noise,
    _toeplitz_discount,
)

H, W = 16, 32


def test_toeplitz_discount_matrix():
    phi = 0.7
    D = _toeplitz_discount(phi, 4)
    # lower-triangular powers of phi: D[i, j] = phi^(i-j)
    for i in range(4):
        for j in range(4):
            want = phi ** (i - j) if i >= j else 0.0
            assert abs(D[i, j] - want) < 1e-12


def test_multistep_trajectory_correlation():
    """With replace_state, spectral states at steps t, t' correlate as
    phi^|t-t'| (the OU autocovariance), stationary in t."""
    lambd = 0.35
    phi = np.exp(-lambd)
    T = 4
    noise = DiffusionNoiseS2((H, W), num_channels=1, num_time_steps=T, sigma=1.0, lambd=lambd)
    state = np.asarray(noise.update(jnp.zeros((512,) + noise.state_shape), jax.random.PRNGKey(0), replace_state=True))
    # use the l>=1 spectral coefficients as samples (l=0 has sigma_l ~ 0)
    s = state[:, :, 0, 1:8, 0, :].reshape(512, T, -1)
    for t0 in range(T):
        for t1 in range(T):
            num = np.mean(s[:, t0] * s[:, t1], axis=0)
            den = np.sqrt(np.mean(s[:, t0] ** 2, axis=0) * np.mean(s[:, t1] ** 2, axis=0))
            corr = (num / den).mean()
            assert abs(corr - phi ** abs(t0 - t1)) < 0.1, (t0, t1, corr)
    # stationarity: per-step variance flat across the window
    var = np.mean(s**2, axis=(0, 2))
    assert np.all(np.abs(var / var[0] - 1.0) < 0.2), var


def test_ar_update_rolls_window():
    """A non-replace update shifts the T-step window by one AR step: the old
    steps 1..T-1 become the new steps 0..T-2 exactly."""
    T = 3
    noise = DiffusionNoiseS2((H, W), num_channels=2, num_time_steps=T, lambd=0.5)
    s0 = noise.init_state(jax.random.PRNGKey(1), 4)
    s1 = noise.update(s0, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(s1[:, :-1]), np.asarray(s0[:, 1:]), atol=0)
    # and the new last step is phi * old last + innovation (nonzero change)
    assert np.abs(np.asarray(s1[:, -1] - s0[:, -1])).max() > 0


def test_per_channel_parameters_broadcast():
    """List-valued kT/lambd give each channel its own spectrum/decay."""
    noise = DiffusionNoiseS2((H, W), num_channels=2, num_time_steps=1, kT=[0.001, 0.1], lambd=[0.1, 2.0])
    sig = np.asarray(noise.sigma_l)[0, 0, :, :, 0, 0]  # (C, lmax)
    # larger kT decays faster in l: channel 1's spectrum is more concentrated
    ratio0 = sig[0, 8] / sig[0, 1]
    ratio1 = sig[1, 8] / sig[1, 1]
    assert ratio1 < ratio0
    phi = np.asarray(noise.phi).reshape(2)
    np.testing.assert_allclose(phi, np.exp(-np.asarray([0.1, 2.0])), rtol=1e-6)


def test_sample_variance_matches_sigma_target():
    """The area-mean variance of sampled diffusion noise is ~ sigma^2 (the
    F0 normalization fixes the stationary pointwise variance)."""
    sigma = 1.7
    noise = DiffusionNoiseS2((H, W), num_channels=1, num_time_steps=1, sigma=sigma, kT=0.01, lambd=0.7)
    state = noise.init_state(jax.random.PRNGKey(3), 256)
    fields = np.asarray(noise.sample(state))[:, 0, 0]  # (N, H, W)
    w = np.sin(np.linspace(0, np.pi, H))[:, None]
    var = (np.mean(fields**2, axis=0) * w).sum() / (w.sum() * W)
    assert abs(var / sigma**2 - 1.0) < 0.15, var


def test_stateful_protocol():
    assert DiffusionNoiseS2((H, W), 1).is_stateful()
    assert not IsotropicGaussianRandomFieldS2((H, W), 1).is_stateful()
    assert not DummyNoiseS2((H, W), 1).is_stateful()


def test_dummy_noise_zero():
    noise = DummyNoiseS2((H, W), num_channels=3, num_time_steps=2)
    s = noise.init_state(jax.random.PRNGKey(0), 2)
    s = noise.update(s, jax.random.PRNGKey(1))
    out = np.asarray(noise.sample(s))
    assert out.shape == (2, 2, 3, H, W)
    np.testing.assert_array_equal(out, 0.0)


def test_build_noise_factory():
    for typ, cls in [
        ("white", IsotropicGaussianRandomFieldS2),
        ("diffusion", DiffusionNoiseS2),
        ("dummy", DummyNoiseS2),
    ]:
        got = build_noise({"type": typ, "sigma": 0.5}, (H, W))
        assert isinstance(got, cls), (typ, type(got))
