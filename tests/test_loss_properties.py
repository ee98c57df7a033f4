"""Common-property matrix over the full loss zoo.

Mirrors the reference's loss test strategy (ref tests/test_losses.py:231-335
TestLossCommon, :337-418 TestGeometricLpLoss, :419-659 spectral classes,
:1023-1626 TestLossHandler) with property tests rather than golden values:
nonnegativity, zero-on-perfect, batch-size independence, squared-flag
consistency, closed-form constant-difference norms, relative-loss unity,
spatial-weight semantics, multistep weight modes, and CRPS fairness
orderings — each computed against the analytic expectation, not against a
stored output.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.utils.loss import LOSS_REGISTRY, LossHandler, _multistep_weight
from makani_tpu.utils.yparams import ParamsBase

H, W = 16, 32
B, E = 2, 4
# channel set that satisfies every structured loss: a (u, v) wind pair for
# vort-div, z/t at two pressure levels for hydrostatic balance
NAMES = ["u500", "v500", "z500", "t500", "z850", "t850", "tcwv", "t2m"]
C = len(NAMES)


def _mk(loss_type, **extra):
    return LOSS_REGISTRY[loss_type](img_shape=(H, W), channel_names=NAMES, grid_type="equiangular", **extra)


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale)


# every registry entry once (aliases collapsed), with its input arity and the
# properties that hold for it
ZOO = [
    # name, needs_ensemble, nonneg, zero_on_perfect, params
    ("l1", False, True, True, {}),
    ("l2", False, True, True, {}),
    ("relative l2", False, True, True, {}),
    ("squared l2", False, True, True, {}),
    ("spectral l1", False, True, True, {}),
    ("spectral l2", False, True, True, {}),
    ("h1", False, True, True, {}),
    ("amse", False, True, True, {}),
    ("hydrostatic", False, True, False, {}),  # measures prd's own balance, not prd-tar
    ("crps", True, True, True, {}),
    ("crps", True, True, True, {"crps_type": "cdf"}),
    ("crps", True, True, True, {"crps_type": "gauss"}),
    ("spectral crps", True, True, True, {}),
    ("ensemble_gradient_crps", True, True, True, {}),
    ("ensemble_vort_div_crps", True, True, True, {}),
    ("ensemble_nll", True, False, False, {}),  # differential-entropy NLL may be negative
    # the reference's MMD estimator (ref mmd_loss.py:219 ``eskill - 0.5 *
    # espread`` over Gaussian SIMILARITY kernels) is not zero-on-perfect: a
    # point mass on the truth scores 1 - 0.5 (E-1+alpha)/E; pinned exactly in
    # test_gaussian_mmd_perfect_closed_form
    ("gaussian_mmd", True, True, False, {}),
    ("energy score", True, True, True, {}),
    ("sobolev_energy_score", True, True, True, {}),
    ("spectral_l2_energy_score", True, True, True, {}),
    ("spectral_coherence", True, True, False, {}),  # coherence of noise vs itself is 1, loss 0 only up to eps
    ("corrected_spectral_l2_energy_score", True, True, True, {}),
    ("drift_regularization", True, True, True, {}),
    ("spectral_regularization", True, True, True, {}),
    ("coherence_regularization", True, True, False, {}),
]

IDS = [f"{n}-{p.get('crps_type', '')}" if p else n for n, _, _, _, p in ZOO]


def _eval(loss, ens, seed=0, perfect=False):
    tar = _rand((B, C, H, W), seed=seed + 1)
    if ens:
        prd = jnp.repeat(tar[:, None], E, axis=1) if perfect else _rand((B, E, C, H, W), seed=seed)
    else:
        prd = tar if perfect else _rand((B, C, H, W), seed=seed)
    return np.asarray(loss(prd, tar))


@pytest.mark.parametrize("name,ens,nonneg,zperf,params", ZOO, ids=IDS)
def test_zoo_finite_shape_and_nonneg(name, ens, nonneg, zperf, params):
    """Every loss returns finite per-(sample, channel) values of width
    n_channels, nonnegative where the score is a proper distance
    (ref test_losses.py:300-320 TestLossCommon)."""
    loss = _mk(name, **params)
    out = _eval(loss, ens, seed=3)
    assert out.shape == (B, loss.n_channels)
    assert np.isfinite(out).all()
    if nonneg:
        assert (out >= -1e-5).all(), f"{name} produced negative values: {out.min()}"


@pytest.mark.parametrize("name,ens,nonneg,zperf,params", ZOO, ids=IDS)
def test_zoo_zero_on_perfect(name, ens, nonneg, zperf, params):
    """A perfect (point-mass on the truth) prediction scores ~0 for every
    proper score (ref test_losses.py:311-320)."""
    if not zperf:
        pytest.skip("score is not zero-on-perfect by construction")
    loss = _mk(name, **params)
    out = _eval(loss, ens, seed=5, perfect=True)
    assert np.abs(out).max() < 5e-3, f"{name} on perfect prediction: {np.abs(out).max()}"


def test_gaussian_mmd_perfect_closed_form():
    """On a point-mass-on-truth ensemble both kernel distances are 0, so
    k(.) = 1 everywhere and the estimator reduces exactly to
    1 - 0.5 (E-1+alpha)/E (ref mmd_loss.py:208-219)."""
    for alpha in (1.0, 0.5):
        loss = _mk("gaussian_mmd", alpha=alpha)
        out = _eval(loss, ens=True, seed=5, perfect=True)
        want = 1.0 - 0.5 * (E - 1.0 + alpha) / E
        np.testing.assert_allclose(out, want, rtol=1e-6)


def test_gaussian_mmd_prefers_skillful_similarity():
    """The estimator is DECREASING in forecast error similarity terms: a
    forecast far from the truth loses the skill kernel mass (k -> 0) while a
    tight wrong ensemble keeps its spread kernel mass, scoring lower than the
    perfect forecast under this sign convention — the reference trains MMD
    jointly with CRPS, which supplies the skill direction."""
    loss = _mk("gaussian_mmd")
    perfect = _eval(loss, ens=True, seed=7, perfect=True)
    tar = _rand((B, C, H, W), seed=8)
    far = jnp.repeat(tar[:, None], E, axis=1) + 50.0
    off = np.asarray(loss(far, tar))
    assert (off < perfect).all()


@pytest.mark.parametrize("name,ens,nonneg,zperf,params", ZOO, ids=IDS)
def test_zoo_batchsize_independence(name, ens, nonneg, zperf, params):
    """Per-sample loss rows must not depend on what else is in the batch
    (ref test_losses.py:321-335): evaluating [x; y] reproduces rows of x."""
    loss = _mk(name, **params)
    tar = _rand((B, C, H, W), seed=11)
    prd = _rand((B, E, C, H, W), seed=12) if ens else _rand((B, C, H, W), seed=12)
    single = np.asarray(loss(prd, tar))
    prd2 = jnp.concatenate([prd, prd[::-1]], axis=0)
    tar2 = jnp.concatenate([tar, tar[::-1]], axis=0)
    double = np.asarray(loss(prd2, tar2))
    np.testing.assert_allclose(double[:B], single, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(double[B:], single[::-1], rtol=2e-5, atol=2e-6)


# ---------------------------------------------------------------- geometric Lp


@pytest.mark.parametrize("p", [1.0, 2.0, 3.0, 4.0])
def test_geometric_constant_difference_closed_form(p):
    """|prd - tar| = c everywhere -> Lp norm over the normalized sphere
    quadrature is exactly c for every p (ref test_losses.py:355-367)."""
    loss = _mk("l2")
    loss.p = p
    c = 0.731
    tar = _rand((B, C, H, W), seed=21)
    out = np.asarray(loss(tar + c, tar))
    np.testing.assert_allclose(out, c, rtol=1e-5)


@pytest.mark.parametrize("p", [1.0, 2.0, 4.0])
def test_geometric_squared_flag_is_pth_power(p):
    """squared=True returns the p-th power of the rooted norm
    (ref test_losses.py:344-354, 379-389)."""
    from makani_tpu.utils.losses.lp_loss import GeometricLpLoss

    rooted = GeometricLpLoss(img_shape=(H, W), channel_names=NAMES, p=p, squared=False)
    squared = GeometricLpLoss(img_shape=(H, W), channel_names=NAMES, p=p, squared=True)
    prd, tar = _rand((B, C, H, W), 31), _rand((B, C, H, W), 32)
    np.testing.assert_allclose(np.asarray(squared(prd, tar)), np.asarray(rooted(prd, tar)) ** p, rtol=1e-4)


@pytest.mark.parametrize("p", [1.0, 2.0, 4.0])
def test_geometric_relative_unity_at_double_target(p):
    """relative=True with prd = 2*tar integrates |tar|^p / |tar|^p = 1
    (ref test_losses.py:391-406)."""
    from makani_tpu.utils.losses.lp_loss import GeometricLpLoss

    loss = GeometricLpLoss(img_shape=(H, W), channel_names=NAMES, p=p, relative=True)
    tar = _rand((B, C, H, W), seed=41, scale=3.0)
    out = np.asarray(loss(2.0 * tar, tar))
    np.testing.assert_allclose(out, 1.0, rtol=1e-4)


def test_geometric_p_parameter_differentiates():
    """Different p produce genuinely different values on a non-constant error
    (ref test_losses.py:368-377)."""
    prd, tar = _rand((B, C, H, W), 51), _rand((B, C, H, W), 52)
    outs = []
    for p in (1.0, 2.0, 4.0):
        loss = _mk("l2")
        loss.p = p
        outs.append(np.asarray(loss(prd, tar)))
    assert not np.allclose(outs[0], outs[1]) and not np.allclose(outs[1], outs[2])


@pytest.mark.parametrize("p", [1.0, 4.0])
def test_geometric_gradient_flow(p):
    """Finite nonzero gradients through the rooted norm (ref :408-418)."""
    from makani_tpu.utils.losses.lp_loss import GeometricLpLoss

    loss = GeometricLpLoss(img_shape=(H, W), channel_names=NAMES, p=p)
    prd, tar = _rand((B, C, H, W), 61), _rand((B, C, H, W), 62)
    g = jax.grad(lambda x: jnp.sum(loss(x, tar)))(prd)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_geometric_spatial_weight_semantics():
    """wgt multiplies the integrand: ones is identity, zeros kills the loss,
    and an indicator restricts the integral to its support
    (ref test_losses.py:978-1022 TestSpectralLossWeighted, geometric case)."""
    from makani_tpu.utils.losses.lp_loss import GeometricLpLoss

    loss = GeometricLpLoss(img_shape=(H, W), channel_names=NAMES, p=2.0, squared=True)
    prd, tar = _rand((B, C, H, W), 71), _rand((B, C, H, W), 72)
    base = np.asarray(loss(prd, tar))
    np.testing.assert_allclose(np.asarray(loss(prd, tar, wgt=jnp.ones((H, W)))), base, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loss(prd, tar, wgt=jnp.zeros((H, W)))), 0.0, atol=1e-7)
    # indicator over the northern half + its complement partition the integral
    north = jnp.asarray((np.arange(H) < H // 2).astype(np.float32))[:, None] * jnp.ones((1, W))
    south = 1.0 - north
    part = np.asarray(loss(prd, tar, wgt=north)) + np.asarray(loss(prd, tar, wgt=south))
    np.testing.assert_allclose(part, base, rtol=1e-5)


# ------------------------------------------------------------------ spectral


def test_spectral_squared_flag_consistency():
    """(ref test_losses.py:425-433)"""
    from makani_tpu.utils.losses.lp_loss import SpectralLpLoss

    rooted = SpectralLpLoss(img_shape=(H, W), channel_names=NAMES, p=2.0)
    squared = SpectralLpLoss(img_shape=(H, W), channel_names=NAMES, p=2.0, squared=True)
    prd, tar = _rand((B, C, H, W), 81), _rand((B, C, H, W), 82)
    np.testing.assert_allclose(np.asarray(squared(prd, tar)), np.asarray(rooted(prd, tar)) ** 2, rtol=1e-4)


def test_h1_constant_difference_has_zero_seminorm():
    """A constant error lives entirely in l=0: the l(l+1)-weighted seminorm
    vanishes and the blended H1 value reduces to sqrt(alpha)*|c|
    (ref test_losses.py:500-510)."""
    from makani_tpu.utils.losses.lp_loss import SpectralH1Loss

    alpha = 0.5
    loss = SpectralH1Loss(img_shape=(H, W), channel_names=NAMES, squared=True, alpha=alpha)
    tar = _rand((B, C, H, W), seed=91)
    c = 1.37
    out = np.asarray(loss(tar + c, tar))
    # Parseval with 4pi-normalized spectrum_sq: l2 part integrates c^2
    np.testing.assert_allclose(out, alpha * c * c * 4.0 * np.pi, rtol=1e-3)


def test_h1_penalizes_high_frequency_more():
    """Two errors with identical geometric L2 but different wavenumber
    content: the higher-l error must score a larger H1 (ref :511-536)."""
    from makani_tpu.ops.sht import InverseRealSHT
    from makani_tpu.utils.losses.lp_loss import SpectralH1Loss

    isht = InverseRealSHT(H, W, grid="equiangular")
    lmax = isht.lmax

    def field_at_degree(l):
        coeffs = np.zeros((1, 1, lmax, isht.mmax, 2), np.float32)
        coeffs[0, 0, l, 0, 0] = 1.0
        return isht.synthesis(jnp.asarray(coeffs))

    lo = field_at_degree(2)
    hi = field_at_degree(10)
    loss = SpectralH1Loss(img_shape=(H, W), channel_names=NAMES[:1], squared=True, alpha=0.0)
    tar = jnp.zeros_like(lo)
    assert float(loss(hi, tar)[0, 0]) > 10.0 * float(loss(lo, tar)[0, 0])


def test_spectral_lowpass_weight_reduces_loss():
    """Zeroing all but the lowest SH degrees through wgt shrinks the spectral
    loss of a broadband error (ref test_losses.py:998-1022)."""
    from makani_tpu.utils.losses.lp_loss import SpectralLpLoss

    loss = SpectralLpLoss(img_shape=(H, W), channel_names=NAMES, p=2.0, squared=True)
    prd, tar = _rand((B, C, H, W), 95), _rand((B, C, H, W), 96)
    base = np.asarray(loss(prd, tar))
    lmax, mmax = loss.sht.lmax, loss.sht.mmax
    dc_only = np.zeros((lmax, mmax), np.float32)
    dc_only[:2, :] = 1.0
    cut = np.asarray(loss(prd, tar, wgt=jnp.asarray(dc_only)[..., None]))
    assert (cut < 0.2 * base).all()


# ------------------------------------------------------------------- CRPS


def test_fair_crps_below_biased_for_spread_ensemble():
    """The fair (skillspread, alpha=1 with E/(E-1) spread correction) CRPS of
    a dispersed ensemble is below the biased cdf estimate
    (ref test_losses.py:1940-1954)."""
    fair = _mk("crps", crps_type="skillspread", alpha=1.0)
    biased = _mk("crps", crps_type="cdf")
    tar = _rand((B, C, H, W), seed=101)
    prd = tar[:, None] + _rand((B, E, C, H, W), seed=102)
    f, b = np.asarray(fair(prd, tar)), np.asarray(biased(prd, tar))
    assert (f < b + 1e-7).all()
    assert f.mean() < b.mean() - 1e-4


@pytest.mark.parametrize("crps_type", ["skillspread", "cdf"])
def test_crps_gradient_sums_to_zero_on_symmetric_perfect(crps_type):
    """On a point ensemble equal to the truth, the subgradients across
    members must cancel: sum of dCRPS/dmember == 0 (ref :1914-1939)."""
    loss = _mk("crps", crps_type=crps_type)
    tar = _rand((B, C, H, W), seed=111)
    prd = jnp.repeat(tar[:, None], E, axis=1)
    g = jax.grad(lambda x: jnp.sum(loss(x, tar)))(prd)
    member_sum = np.asarray(jnp.sum(g, axis=1))
    np.testing.assert_allclose(member_sum, 0.0, atol=1e-5)


# --------------------------------------------------------------- LossHandler


def _handler_params(losses, n_future=0, **over):
    d = dict(
        losses=losses,
        img_shape_x=H,
        img_shape_y=W,
        channel_names=NAMES,
        in_channels=list(range(C)),
        out_channels=list(range(C)),
        n_future=n_future,
        model_grid_type="equiangular",
    )
    d.update(over)
    return ParamsBase(d)


COMBOS = [
    [{"type": "l2", "channel_weights": "constant"}],
    [{"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}}, {"type": "h1", "channel_weights": "auto", "relative_weight": 0.3}],
    [{"type": "crps", "channel_weights": "constant"}, {"type": "drift_regularization", "channel_weights": "constant", "relative_weight": 0.01}],
]


@pytest.mark.parametrize("losses", COMBOS)
def test_handler_zero_on_perfect(losses):
    """(ref test_losses.py:1194-1205)"""
    lh = LossHandler(_handler_params(losses))
    tar = _rand((B, C, H, W), seed=121)
    needs_ens = any("crps" in l["type"] or "regularization" in l["type"] for l in losses)
    prd = jnp.repeat(tar[:, None], E, axis=1) if needs_ens else tar
    assert abs(float(lh(prd, tar))) < 5e-3


@pytest.mark.parametrize("losses", COMBOS)
def test_handler_batchsize_independence(losses):
    """Scalar loss is a batch mean: mean over [x; x] equals mean over x
    (ref test_losses.py:1101-1127)."""
    lh = LossHandler(_handler_params(losses))
    tar = _rand((B, C, H, W), seed=131)
    needs_ens = any("crps" in l["type"] or "regularization" in l["type"] for l in losses)
    prd = _rand((B, E, C, H, W), seed=132) if needs_ens else _rand((B, C, H, W), seed=132)
    one = float(lh(prd, tar))
    two = float(lh(jnp.concatenate([prd, prd]), jnp.concatenate([tar, tar])))
    np.testing.assert_allclose(two, one, rtol=1e-5)


def test_multistep_weight_modes_matrix():
    """All five named modes: correct shape, nonneg, and the documented mass
    distribution (ref test_losses.py:1262-1326)."""
    n_future = 3
    n = n_future + 1
    w = _multistep_weight(n_future, "constant")
    np.testing.assert_allclose(w, np.full(n, 1.0 / n), rtol=1e-6)
    w = _multistep_weight(n_future, "balanced")
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    assert (np.diff(w) > 0).all()  # later steps weigh more
    w = _multistep_weight(n_future, "linear")
    np.testing.assert_allclose(w, np.arange(1, n + 1) / n, rtol=1e-6)
    w = _multistep_weight(n_future, "last-n-1")
    assert w[0] == 0.0 and np.allclose(w[1:], 1.0 / n_future)
    w = _multistep_weight(n_future, "last")
    assert w[-1] == 1.0 and np.allclose(w[:-1], 0.0)
    w = _multistep_weight(n_future, "custom", weights=[0.1, 0.2, 0.3, 0.4])
    np.testing.assert_allclose(w, [0.1, 0.2, 0.3, 0.4], rtol=1e-6)


def test_multistep_weight_custom_wrong_length_raises():
    with pytest.raises(ValueError):
        _multistep_weight(3, "custom", weights=[0.5, 0.5])


def test_multistep_weight_unknown_raises():
    with pytest.raises(ValueError):
        _multistep_weight(3, "nope")


def test_handler_unknown_loss_raises():
    with pytest.raises(NotImplementedError):
        LossHandler(_handler_params([{"type": "definitely-not-a-loss"}]))


def test_handler_relative_weight_scales_term():
    """Doubling relative_weight on a single-term handler doubles the loss
    (ref test_losses.py:1602-1626)."""
    prd, tar = _rand((B, C, H, W), 141), _rand((B, C, H, W), 142)
    l1 = LossHandler(_handler_params([{"type": "l2", "channel_weights": "constant", "relative_weight": 1.0}]))
    l2 = LossHandler(_handler_params([{"type": "l2", "channel_weights": "constant", "relative_weight": 2.0}]))
    np.testing.assert_allclose(float(l2(prd, tar)), 2.0 * float(l1(prd, tar)), rtol=1e-6)


def test_handler_channel_weights_as_explicit_list():
    """An explicit per-channel list is used verbatim: zeroing one channel
    removes its error from the scalar (ref test_losses.py:1575-1601)."""
    cw = [1.0] * C
    cw[3] = 0.0
    lh = LossHandler(_handler_params([{"type": "l2", "channel_weights": cw}]))
    tar = _rand((B, C, H, W), seed=151)
    prd = tar.at[:, 3].add(100.0)  # huge error only in the zeroed channel
    assert abs(float(lh(prd, tar))) < 1e-4


def test_handler_temp_diff_normalization_scales_weights():
    """temp_diff_normalization multiplies channel weights by 1/std of the
    time-differenced field (ref loss.py:86-92): with synthetic stds the
    weighted losses differ accordingly."""
    import h5py

    stds = (0.5 + np.arange(C).astype(np.float32)).reshape(1, C, 1, 1)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "time_diff_stds.npy")
        np.save(p, stds)
        base = _handler_params([{"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}}])
        lh0 = LossHandler(base)
        scaled_cfg = _handler_params([{"type": "l2", "channel_weights": "constant", "temp_diff_normalization": True, "parameters": {"squared": True}}])
        scaled_cfg["time_diff_stds_path"] = p
        lh1 = LossHandler(scaled_cfg)
        ratio = lh1.channel_weights.reshape(-1) / lh0.channel_weights.reshape(-1)
        np.testing.assert_allclose(ratio, 1.0 / stds.reshape(-1), rtol=1e-5)


def test_handler_multistep_folds_lead_time_weights():
    """n_future=1 with weight_type='last': only the second step's error
    reaches the scalar (ref test_losses.py:1158-1193)."""
    lh = LossHandler(
        _handler_params(
            [{"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}}],
            n_future=1,
            multistep={"weight_type": "last"},
        )
    )
    tar = _rand((B, 2 * C, H, W), seed=161)
    prd_err_first = tar.at[:, :C].add(1.0)
    prd_err_last = tar.at[:, C:].add(1.0)
    assert abs(float(lh(prd_err_first, tar, train=True))) < 1e-6
    assert float(lh(prd_err_last, tar, train=True)) > 1e-3
