"""Preprocessor breadth tests: perturb-noise mode, bias correction,
exponential history weighting, static-feature padding and channel counting
(ref makani tests/test_preprocessor.py — the noise-injection, bias and
static-feature suites; ref makani/models/preprocessor.py:149-232, 341-460).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.models.preprocessor import (
    Preprocessor2D,
    get_bias_correction,
    get_unpredicted_channels,
)
from makani_tpu.utils.yparams import ParamsBase

H, W = 8, 16


def make_pre(**kw):
    base = dict(
        img_shape_x=H,
        img_shape_y=W,
        n_history=0,
        channel_names=["a", "b", "c"],
        model_grid_type="equiangular",
    )
    base.update(kw)
    return Preprocessor2D(ParamsBase(base))


# ---- input-noise "perturb" mode -------------------------------------------


def test_perturb_noise_adds_to_selected_channels():
    """Noise channels of the unpredicted tensor are ADDED to the named input
    channels; nothing is concatenated (ref preprocessor.py:176-179, 449-456)."""
    pre = make_pre(
        in_channels=[0, 1, 2],
        input_noise=dict(mode="perturb", perturb_channels=["b"]),
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, H, W).astype(np.float32))
    noise = jnp.asarray(rng.randn(2, 1, 1, H, W).astype(np.float32))
    out = pre.append_channels(x, noise)
    assert out.shape == x.shape  # perturb mode adds, never widens
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    np.testing.assert_allclose(np.asarray(out[:, 2]), np.asarray(x[:, 2]))
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(x[:, 1] + noise[:, 0, 0]), rtol=1e-6)


def test_perturb_noise_with_leading_zenith():
    """Leading channels (zenith) still concatenate; only the trailing noise
    channels perturb."""
    pre = make_pre(
        in_channels=[0, 1, 2],
        add_zenith=True,
        input_noise=dict(mode="perturb", perturb_channels=["a", "c"]),
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 3, H, W).astype(np.float32))
    # unpredicted = [zenith, noise_a, noise_c] per timestep
    unp = jnp.asarray(rng.randn(2, 1, 3, H, W).astype(np.float32))
    out = pre.append_channels(x, unp)
    assert out.shape == (2, 4, H, W)  # 3 inputs + zenith
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0] + unp[:, 0, 1]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(x[:, 1]))
    np.testing.assert_allclose(np.asarray(out[:, 2]), np.asarray(x[:, 2] + unp[:, 0, 2]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 3]), np.asarray(unp[:, 0, 0]))


def test_perturb_noise_history_broadcast():
    """With n_history > 0 the perturbation applies per timestep."""
    pre = make_pre(
        n_history=1,
        in_channels=[0, 1, 2],
        input_noise=dict(mode="perturb", perturb_channels=["a"]),
    )
    rng = np.random.RandomState(2)
    x5 = rng.randn(2, 2, 3, H, W).astype(np.float32)
    x = pre.flatten_history(jnp.asarray(x5))
    noise = jnp.asarray(rng.randn(2, 2, 1, H, W).astype(np.float32))
    out = pre.expand_history(pre.append_channels(x, noise), 2)
    for t in range(2):
        np.testing.assert_allclose(
            np.asarray(out[:, t, 0]), x5[:, t, 0] + np.asarray(noise[:, t, 0]), rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(out[:, t, 1]), x5[:, t, 1])


# ---- unpredicted-channel counting -----------------------------------------


@pytest.mark.parametrize(
    "cfg, want",
    [
        (dict(add_zenith=True), 1),
        (dict(add_zenith=False), 0),
        (dict(add_zenith=True, input_noise=dict(mode="concatenate", n_channels=2)), 3),
        (dict(add_zenith=False, input_noise=dict(mode="concatenate")), 1),
        (dict(add_zenith=True, input_noise=dict(mode="perturb", perturb_channels=["a", "b"])), 3),
        # perturb with no explicit list defaults to every input channel
        (dict(add_zenith=False, in_channels=[0, 1, 2], input_noise=dict(mode="perturb")), 3),
    ],
)
def test_get_unpredicted_channels(cfg, want):
    params = ParamsBase(dict(channel_names=["a", "b", "c"], **cfg))
    assert get_unpredicted_channels(params) == want


def test_get_unpredicted_channels_without_noise():
    """with_noise=False counts only the zenith channel — the converter and
    shape-derivation paths use this to size the model input."""
    params = ParamsBase(
        dict(channel_names=["a", "b"], add_zenith=True, input_noise=dict(mode="concatenate", n_channels=4))
    )
    assert get_unpredicted_channels(params, with_noise=False) == 1


# ---- bias correction -------------------------------------------------------


def test_bias_correction_subtracts(tmp_path):
    rng = np.random.RandomState(3)
    bias = rng.randn(1, 3, H, W).astype(np.float32)
    p = tmp_path / "bias.npy"
    np.save(p, bias)
    pre = make_pre(bias_correction=str(p), out_channels=[0, 1, 2])
    x = jnp.asarray(rng.randn(2, 3, H, W).astype(np.float32))
    out = pre.correct_bias(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) - bias, rtol=1e-6)


def test_bias_correction_out_channel_subset(tmp_path):
    """A full-width bias file is row-selected down to out_channels
    (ref preprocessor get_bias_correction path)."""
    rng = np.random.RandomState(4)
    bias = rng.randn(1, 5, H, W).astype(np.float32)
    p = tmp_path / "bias.npy"
    np.save(p, bias)
    params = ParamsBase(dict(bias_correction=str(p), out_channels=[0, 2, 4]))
    got = get_bias_correction(params)
    np.testing.assert_allclose(got, bias[:, [0, 2, 4]])


def test_bias_correction_3d_file_promoted(tmp_path):
    bias = np.random.RandomState(5).randn(2, H, W).astype(np.float32)
    p = tmp_path / "bias.npy"
    np.save(p, bias)
    params = ParamsBase(dict(bias_correction=str(p), out_channels=[0, 1]))
    got = get_bias_correction(params)
    assert got.shape == (1, 2, H, W)


# ---- exponential history weighting ----------------------------------------


def test_exponential_history_weights_normalized_and_recency_biased():
    pre = make_pre(
        n_history=3, history_normalization_mode="exponential", history_normalization_decay=0.5
    )
    w = pre.history_normalization_weights.ravel()
    assert w.shape == (4,)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    # most recent step (last index) carries the largest weight
    assert np.all(np.diff(w) > 0)
    # decay=0.5 ratio between consecutive steps is e^0.5
    np.testing.assert_allclose(w[1:] / w[:-1], np.exp(0.5), rtol=1e-5)


def test_history_stats_match_numpy_quadrature():
    """history_compute_stats equals the hand-rolled weighted quadrature
    statistics."""
    pre = make_pre(n_history=1, history_normalization_mode="exponential", history_normalization_decay=1.0)
    rng = np.random.RandomState(6)
    x5 = rng.randn(2, 2, 3, H, W).astype(np.float32) * 3 + 1
    x = pre.flatten_history(jnp.asarray(x5))
    mean, std = pre.history_compute_stats(x)

    qw = np.asarray(pre.quadrature.quad_weight, np.float64)
    qw = qw / qw.sum()
    w = pre.history_normalization_weights.ravel().astype(np.float64)
    smean = np.sum(x5.astype(np.float64) * qw, axis=(-2, -1))  # (B, T, C)
    want_mean = np.sum(smean * w[None, :, None], axis=1)
    svar = np.sum((x5 - want_mean[:, None, :, None, None]) ** 2 * qw, axis=(-2, -1))
    want_std = np.sqrt(np.sum(svar * w[None, :, None], axis=1))
    np.testing.assert_allclose(np.asarray(mean)[..., 0, 0], want_mean, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(std)[..., 0, 0], want_std, rtol=1e-4)


# ---- static features -------------------------------------------------------


def test_static_features_padded_grid_and_removal():
    """On a latitude-padded input grid the static features are zero-padded to
    match, and remove_static_features restores the original width."""
    pre = make_pre(add_grid=True, gridtype="sinusoidal", grid_num_frequencies=2)
    assert pre.do_add_static_features
    nstat = pre.n_static_channels
    x = jnp.asarray(np.random.RandomState(7).randn(2, 3, H + 2, W).astype(np.float32))
    out = pre.add_static_features(x)
    assert out.shape == (2, 3 + nstat, H + 2, W)
    # padded rows carry zeros
    np.testing.assert_allclose(np.asarray(out[:, 3:, H:, :]), 0.0)
    back = pre.remove_static_features(out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_append_history_zero_history_passthrough():
    pre = make_pre(n_history=0)
    x1 = jnp.asarray(np.ones((1, 3, H, W), np.float32))
    x2 = jnp.asarray(np.full((1, 3, H, W), 2.0, np.float32))
    out = pre.append_history(x1, x2, step=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x2))
