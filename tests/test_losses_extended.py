"""Extended loss zoo tests (ref makani tests/test_losses.py for the AMSE,
hydrostatic, NLL, MMD, energy-score, gradient/vortdiv CRPS and regularization
families)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.utils.loss import LOSS_REGISTRY, LossHandler
from makani_tpu.utils.yparams import ParamsBase

NAMES = ["u500", "v500", "z500", "t500", "z850", "t850"]
SHAPE = (16, 32)
KW = dict(img_shape=SHAPE, channel_names=NAMES, grid_type="legendre-gauss")


def _rand(B=2, C=len(NAMES), seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(B, C, *SHAPE).astype(np.float32))


def _rand_ens(B=2, E=4, C=len(NAMES), seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(B, E, C, *SHAPE).astype(np.float32))


def test_amse_zero_on_perfect_and_positive():
    fn = LOSS_REGISTRY["amse"](**KW)
    x = _rand()
    # not exactly zero: the eps guard in the coherence denominator leaves an
    # O(eps / power) residual at high degrees (same in the reference)
    out = np.asarray(fn(x, x))
    np.testing.assert_allclose(out, 0.0, atol=5e-3)
    out2 = np.asarray(fn(_rand(seed=1), _rand(seed=2)))
    assert (out2 > 0.1).all() and out2.shape == (2, len(NAMES))


def test_ensemble_nll_gaussian_analytic():
    """For a large Gaussian ensemble, NLL ~ 0.5(log sigma^2 + 1) on average."""
    fn = LOSS_REGISTRY["ensemble_nll"](**KW)
    rng = np.random.RandomState(0)
    sigma = 2.0
    fc = jnp.asarray(sigma * rng.randn(1, 512, 2, *SHAPE).astype(np.float32))
    obs = jnp.asarray(sigma * rng.randn(1, 2, *SHAPE).astype(np.float32))
    out = np.asarray(fn(fc, obs)).mean()
    expected = 0.5 * (np.log(sigma**2) + 1.0)
    np.testing.assert_allclose(out, expected, rtol=0.1)


def test_gaussian_mmd_analytic_identical_ensemble():
    """Collapsed perfect ensemble: both kernels evaluate at distance 0 -> 1,
    so loss = 1 - 0.5 (E-1+alpha)/E (the reference's fairness factor)."""
    E, alpha = 4, 1.0
    fn = LOSS_REGISTRY["gaussian_mmd"](**KW, sigma=1.0, alpha=alpha)
    obs = _rand(B=1, seed=3)
    fc = jnp.broadcast_to(obs[:, None], (1, E, len(NAMES), *SHAPE))
    out = np.asarray(fn(fc, obs))
    expected = 1.0 - 0.5 * (E - 1.0 + alpha) / E
    assert out.shape == (1, len(NAMES))
    np.testing.assert_allclose(out, expected, atol=1e-5)
    # far-dispersed ensemble: both kernels vanish
    fc2 = fc + 100.0 * _rand_ens(B=1, E=E, seed=4)
    np.testing.assert_allclose(np.asarray(fn(fc2, obs)), 0.0, atol=1e-3)
    # channel reduction collapses the channel axis
    fnr = LOSS_REGISTRY["gaussian_mmd"](**KW, sigma=1.0, channel_reduction=True)
    assert np.asarray(fnr(fc, obs)).shape == (1, 1)


def test_hydrostatic_zero_on_balanced_state():
    """A state built from the hydrostatic relation has zero residual."""
    fn = LOSS_REGISTRY["hydrostatic"](**KW)
    assert fn.n_channels == 1  # one interval: (500, 850)
    rng = np.random.RandomState(0)
    t5 = 230.0 + 5 * rng.randn(2, *SHAPE).astype(np.float32)
    t8 = 270.0 + 5 * rng.randn(2, *SHAPE).astype(np.float32)
    z5 = rng.randn(2, *SHAPE).astype(np.float32) * 100 + 50000
    # z850 = z500 + R_d * (t5+t8)/2 * ln(850/500)  (descending in altitude)
    z8 = z5 - 287.052874247 * 0.5 * (t5 + t8) * np.log(850.0 / 500.0)
    x = jnp.asarray(np.stack([np.zeros_like(t5), np.zeros_like(t5), z5, t5, z8, t8], axis=1))
    out = np.asarray(fn(x, x))
    np.testing.assert_allclose(out, 0.0, atol=1e-2)
    # unbalanced state has a large residual
    x2 = x.at[:, 2].add(1000.0)
    assert np.asarray(fn(x2, x2)).mean() > 1.0


def test_energy_scores_positive_and_zeroish_on_perfect():
    for key in ["lp_energy_score", "sobolev_energy_score", "spectral_l2_energy_score"]:
        fn = LOSS_REGISTRY[key](**KW)
        fc, obs = _rand_ens(seed=5), _rand(seed=6)
        out = np.asarray(fn(fc, obs))
        assert np.isfinite(out).all(), key
        assert (out > 0).all(), key
        # perfect (collapsed, exact) ensemble scores ~0
        perfect = jnp.broadcast_to(obs[:, None], fc.shape)
        out0 = np.asarray(fn(perfect, obs))
        assert np.abs(out0).max() < 1e-2, key
        # gradients finite at the perfect forecast (eps guards)
        g = jax.grad(lambda f: jnp.sum(fn(f, obs)))(perfect)
        assert np.isfinite(np.asarray(g)).all(), key


def test_gradient_crps_shapes_and_zero():
    fn = LOSS_REGISTRY["ensemble_gradient_crps"](**KW)
    fc, obs = _rand_ens(seed=7), _rand(seed=8)
    out = np.asarray(fn(fc, obs))
    assert out.shape == (2, len(NAMES))
    assert (out > -1e-6).all()
    perfect = jnp.broadcast_to(obs[:, None], fc.shape)
    np.testing.assert_allclose(np.asarray(fn(perfect, obs)), 0.0, atol=1e-4)
    # component mode doubles the channels
    fn2 = LOSS_REGISTRY["ensemble_gradient_crps"](**KW, absolute=False)
    assert np.asarray(fn2(fc, obs)).shape == (2, 2 * len(NAMES))


def test_vortdiv_crps_shapes_and_zero():
    fn = LOSS_REGISTRY["ensemble_vort_div_crps"](**KW)
    fc, obs = _rand_ens(seed=9), _rand(seed=10)
    out = np.asarray(fn(fc, obs))
    assert out.shape == (2, len(NAMES))
    assert (out > -1e-6).all()
    perfect = jnp.broadcast_to(obs[:, None], fc.shape)
    np.testing.assert_allclose(np.asarray(fn(perfect, obs)), 0.0, atol=1e-4)


def test_regularizations():
    drift = LOSS_REGISTRY["drift_regularization"](**KW, p=1.0)
    fc, obs = _rand_ens(seed=11), _rand(seed=12)
    out = np.asarray(drift(fc, obs))
    assert out.shape == (2, len(NAMES)) and (out >= 0).all()
    # shifting the forecast mean by c shifts the drift by ~c
    out2 = np.asarray(drift(fc + 0.5, obs))
    assert out2.mean() > out.mean()

    spec = LOSS_REGISTRY["spectral_regularization"](**KW)
    outs = np.asarray(spec(fc, obs))
    assert outs.shape == (2, len(NAMES)) and (outs >= 0).all()
    np.testing.assert_allclose(np.asarray(spec(obs[:, None], obs)), 0.0, atol=1e-4)

    coh = LOSS_REGISTRY["coherence_regularization"](**KW, lmin=2)
    outc = np.asarray(coh(fc, obs))
    assert outc.shape == (2, len(NAMES))
    # perfect coherence -> 0
    np.testing.assert_allclose(np.asarray(coh(obs[:, None], obs)), 0.0, atol=1e-3)
    # anti-correlated member -> ~2
    outa = np.asarray(coh(-obs[:, None], obs))
    np.testing.assert_allclose(outa, 2.0, atol=1e-3)


def test_handler_with_custom_channel_losses():
    """Mixing a hydrostatic term (its own channel count) with l2 works."""
    params = ParamsBase(
        dict(
            img_shape_x=SHAPE[0],
            img_shape_y=SHAPE[1],
            channel_names=NAMES,
            in_channels=list(range(len(NAMES))),
            out_channels=list(range(len(NAMES))),
            n_future=0,
            model_grid_type="legendre-gauss",
            losses=[
                {"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}},
                {"type": "hydrostatic", "relative_weight": 0.1},
            ],
        )
    )
    handler = LossHandler(params)
    prd, tar = _rand(seed=13), _rand(seed=14)
    val = float(handler(prd, tar, train=True))
    assert np.isfinite(val)


def test_dynamic_loss_weighting_stats():
    """Uncertainty/balanced weighting: Welford stats accumulate correctly and
    the weighting activates only after the warmup."""
    base = dict(
        img_shape_x=SHAPE[0],
        img_shape_y=SHAPE[1],
        channel_names=NAMES,
        in_channels=list(range(len(NAMES))),
        out_channels=list(range(len(NAMES))),
        n_future=0,
        model_grid_type="legendre-gauss",
        losses=[{"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}}],
    )
    params = ParamsBase(dict(base, balanced_weighting=True, loss_stats_warmup_batches=2))
    handler = LossHandler(params)
    assert handler.track_running_stats
    stats = handler.init_stats()

    rng = np.random.RandomState(0)
    vals = []
    for i in range(6):
        prd = jnp.asarray(rng.randn(4, len(NAMES), *SHAPE).astype(np.float32))
        tar = jnp.asarray(rng.randn(4, len(NAMES), *SHAPE).astype(np.float32))
        loss, stats = handler(prd, tar, train=True, stats=stats)
        vals.append(float(loss))
    assert float(stats["count"]) == 24.0  # 6 batches x 4 samples
    assert np.isfinite(vals).all()
    # running mean of a squared-l2 of unit-gaussian diffs is ~2 per channel
    # (stats track the RAW per-channel loss values, pre channel weighting)
    mean = np.asarray(stats["mean"])
    np.testing.assert_allclose(mean, 2.0, rtol=0.15)

    # balanced weighting equalizes: post-warmup loss ~ 1 (sum w_c * L_c / mean_c)
    assert 0.5 < vals[-1] < 2.0

    # uncertainty variant also runs and differs from static
    params2 = ParamsBase(dict(base, uncertainty_weighting=True, loss_stats_warmup_batches=0))
    h2 = LossHandler(params2)
    s2 = h2.init_stats()
    l0, s2 = h2(prd, tar, train=True, stats=s2)
    l1, s2 = h2(prd, tar, train=True, stats=s2)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    # gradient flows through the weighted loss
    import jax as _jax

    g = _jax.grad(lambda p: h2(p, tar, train=True, stats=s2)[0])(prd)
    assert np.isfinite(np.asarray(g)).all()


def test_stochastic_loss_options():
    """random_slice_loss mixes channels (invariant for rotation-invariant
    targets); randomized_loss_weights reweights channels randomly."""
    base = dict(
        img_shape_x=SHAPE[0],
        img_shape_y=SHAPE[1],
        channel_names=NAMES,
        in_channels=list(range(len(NAMES))),
        out_channels=list(range(len(NAMES))),
        n_future=0,
        model_grid_type="legendre-gauss",
        losses=[{"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}}],
    )
    h = LossHandler(ParamsBase(dict(base, random_slice_loss=True, randomized_loss_weights=True)))
    assert h.needs_rng
    prd, tar = _rand(seed=20), _rand(seed=21)
    l1 = float(h(prd, tar, train=True, key=jax.random.PRNGKey(0)))
    l2 = float(h(prd, tar, train=True, key=jax.random.PRNGKey(1)))
    assert np.isfinite(l1) and np.isfinite(l2) and l1 != l2
    # without a key (eval) it falls back to the deterministic path
    l3 = float(h(prd, tar, train=False))
    h0 = LossHandler(ParamsBase(base))
    np.testing.assert_allclose(l3, float(h0(prd, tar, train=False)), rtol=1e-6)


def test_coherence_and_corrected_energy_scores():
    for key in ["spectral_coherence", "corrected_spectral_l2_energy_score"]:
        fn = LOSS_REGISTRY[key](**KW)
        fc, obs = _rand_ens(seed=30), _rand(seed=31)
        out = np.asarray(fn(fc, obs))
        assert out.shape == (2, 1), key  # channel_reduction default
        assert np.isfinite(out).all(), key
        # perfect collapsed ensemble ~ 0
        perfect = jnp.broadcast_to(obs[:, None], fc.shape)
        assert np.abs(np.asarray(fn(perfect, obs))).max() < 1e-2, key
        # per-channel mode
        fnc = LOSS_REGISTRY[key](**KW, channel_reduction=False)
        assert np.asarray(fnc(fc, obs)).shape == (2, len(NAMES)), key
