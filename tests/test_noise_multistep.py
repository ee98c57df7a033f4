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


def test_ensemble_noise_rows_multistep_properties():
    """VERDICT r4 item 9: noise-state evolution across rollout steps at E>1.

    EnsembleTrainer._noise_rows draws the full per-member noise time series
    before the jitted step (noise.py OU diffusion state threaded through the
    scan). Pins: shape, antithetic pairing preserved at EVERY rollout step,
    member independence, temporal OU correlation within a member, and
    row-layout invariance (the property the multi-host fold relies on)."""
    import jax

    from makani_tpu.utils.training.ensemble_trainer import EnsembleTrainer
    from makani_tpu.utils.yparams import ParamsBase

    params = ParamsBase(
        dict(
            nettype="SFNO",
            enable_synthetic_data=True,
            img_shape_x=16,
            img_shape_y=32,
            scale_factor=2,
            embed_dim=8,
            num_layers=1,
            channel_names=["u10m", "v10m", "t2m"],
            in_channels=[0, 1, 2],
            out_channels=[0, 1, 2],
            n_history=0,
            n_future=2,
            dt=1,
            dhours=6,
            add_zenith=False,
            batch_size=2,
            ensemble_size=4,
            input_noise={
                "type": "diffusion",
                "n_channels": 2,
                "mode": "concatenate",
                "centered": True,
                "sigma": 1.0,
                "lambd": 0.25,
            },
            n_train_samples_per_epoch=2,
            n_eval_samples=2,
            valid_autoreg_steps=0,
            losses=[{"type": "crps", "channel_weights": "constant", "parameters": {"crps_type": "skillspread"}}],
            lr=1e-3,
            max_epochs=1,
            scheduler="none",
            optimizer_type="Adam",
            normalization_layer="instance_norm_s2",
            save_checkpoint="none",
            exp_dir="/tmp/unused_noise_test",
            multistep={"push_forward": False},
        )
    )
    t = EnsembleTrainer(params)
    B, E, T = 2, 4, 3  # n_history 0 + 1 + n_future 2
    rows = np.arange(B * E)
    bs, es = rows // E, rows % E
    key = jax.random.PRNGKey(7)
    seq = np.asarray(t._noise_rows(key, bs, es, T))  # (B*E, T, Cn, H, W)

    assert seq.shape == (B * E, T, 2, 16, 32)
    assert np.isfinite(seq).all()

    folded = seq.reshape(B, E, T, 2, 16, 32)
    # antithetic pairing holds at every rollout step, not just step 0
    for b in range(B):
        for p in range(E // 2):
            np.testing.assert_allclose(folded[b, 2 * p + 1], -folded[b, 2 * p], atol=1e-6)
    # pairs are mutually independent (and nonzero)
    assert np.abs(folded[0, 0] - folded[0, 2]).max() > 1e-3
    assert np.abs(folded[0, 0] - folded[1, 0]).max() > 1e-3
    assert folded.std() > 0.1

    # OU evolution: consecutive steps of one member are positively correlated,
    # but the state DID evolve (not frozen)
    a, b_ = folded[0, 0, 0].ravel(), folded[0, 0, 1].ravel()
    corr = np.corrcoef(a, b_)[0, 1]
    assert 0.2 < corr < 0.999, corr
    assert np.abs(a - b_).max() > 1e-4

    # row-layout invariance: drawing rows in any order/subset yields the
    # same values per (sample, member) — the multi-host folded-row gather
    # depends on this (ensemble members of one sample may span processes)
    sub_rows = np.array([5, 2, 7])
    sub = np.asarray(t._noise_rows(key, sub_rows // E, sub_rows % E, T))
    for i, r in enumerate(sub_rows):
        np.testing.assert_allclose(sub[i], seq[r], atol=1e-6)
