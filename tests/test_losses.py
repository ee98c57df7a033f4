"""Loss zoo tests (ref makani tests/test_losses.py, 3920 LoC vs analytic
references): geometric/spectral Lp against closed forms, Parseval agreement,
channel weighting, multistep weights, LossHandler reduction."""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.utils.loss import LossHandler, _multistep_weight
from makani_tpu.utils.losses.base_loss import compute_channel_weighting
from makani_tpu.utils.losses.lp_loss import GeometricLpLoss, SpectralLpLoss
from makani_tpu.utils.yparams import ParamsBase

NAMES = ["u10m", "t2m", "z500"]


def test_geometric_l2_analytic():
    """Constant error field: quadrature-normalized squared L2 == c^2."""
    loss = GeometricLpLoss((24, 48), channel_names=NAMES, squared=True)
    prd = jnp.zeros((2, 3, 24, 48))
    tar = jnp.full((2, 3, 24, 48), 3.0)
    out = np.asarray(loss(prd, tar))
    np.testing.assert_allclose(out, 9.0, rtol=1e-5)

    # non-squared: sqrt
    loss2 = GeometricLpLoss((24, 48), channel_names=NAMES, squared=False)
    np.testing.assert_allclose(np.asarray(loss2(prd, tar)), 3.0, rtol=1e-5)


def test_relative_l2():
    loss = GeometricLpLoss((16, 32), channel_names=NAMES, relative=True, squared=True)
    prd = jnp.full((1, 3, 16, 32), 1.0)
    tar = jnp.full((1, 3, 16, 32), 2.0)
    # |1-2|^2 / |2|^2 = 0.25
    np.testing.assert_allclose(np.asarray(loss(prd, tar)), 0.25, rtol=1e-4)


def test_spectral_l2_parseval():
    """Spectral L2 equals geometric L2 for band-limited fields (Parseval)."""
    from makani_tpu.ops.sht import InverseRealSHT

    nlat, nlon, lmax = 24, 48, 12
    rng = np.random.RandomState(0)
    coeff = (rng.randn(1, 3, lmax, lmax) + 1j * rng.randn(1, 3, lmax, lmax)).astype(np.complex64)
    coeff[..., :, 0] = coeff[..., :, 0].real
    ls, ms = np.arange(lmax)[:, None], np.arange(lmax)[None, :]
    coeff = np.where(ms <= ls, coeff, 0.0)
    isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=lmax, grid="legendre-gauss")
    x = np.asarray(isht(coeff))

    geo = GeometricLpLoss((nlat, nlon), channel_names=NAMES, grid_type="legendre-gauss", squared=True)
    spec = SpectralLpLoss((nlat, nlon), channel_names=NAMES, grid_type="legendre-gauss", squared=True)
    g = np.asarray(geo(jnp.asarray(x), jnp.zeros_like(x)))
    # spectral norm: sum |f_lm|^2 (4pi-normalized quadrature divides by 4pi)
    s = np.asarray(spec(jnp.asarray(x), jnp.zeros_like(x))) / (4 * np.pi)
    np.testing.assert_allclose(s, g, rtol=1e-3)


def test_channel_weighting():
    w = compute_channel_weighting(["u10m", "t2m", "z500"], "auto")
    assert abs(w.sum() - 1.0) < 1e-6
    assert w[2] > w[0]  # z500 weighted by pressure level vs 0.1 surface
    wp = compute_channel_weighting(["u10m", "t2m", "z500"], "pangu")
    assert abs(wp.sum() - 1.0) < 1e-6


def test_multistep_weights():
    for kind in ["constant", "balanced", "linear", "last"]:
        w = _multistep_weight(3, kind)
        assert w.shape == (4,)
    np.testing.assert_allclose(_multistep_weight(3, "constant").sum(), 1.0)
    np.testing.assert_allclose(_multistep_weight(3, "balanced").sum(), 1.0, rtol=1e-6)
    assert _multistep_weight(3, "last")[-1] == 1.0


def test_loss_handler_multistep_and_tendency():
    params = ParamsBase(
        dict(
            img_shape_x=16,
            img_shape_y=32,
            channel_names=NAMES,
            in_channels=[0, 1, 2],
            out_channels=[0, 1, 2],
            n_future=1,
            losses=[{"type": "l2", "channel_weights": "constant", "tendency": True, "parameters": {"squared": True}}],
            multistep={"weight_type": "constant"},
        )
    )
    handler = LossHandler(params)
    rng = np.random.RandomState(0)
    inp = jnp.asarray(rng.randn(2, 3, 16, 32).astype(np.float32))
    prd = jnp.asarray(rng.randn(2, 6, 16, 32).astype(np.float32))
    tar = jnp.asarray(rng.randn(2, 6, 16, 32).astype(np.float32))
    val = float(handler(prd, tar, inp=inp, train=True))
    assert np.isfinite(val)
    # tendency: loss of (prd - inp) vs (tar - inp); shifting both by inp is invariant
    val2 = float(handler(prd + 1.0, tar + 1.0, inp=inp + 1.0, train=True))
    np.testing.assert_allclose(val2, val, rtol=1e-4)


def test_loss_handler_probabilistic_dispatch():
    params = ParamsBase(
        dict(
            img_shape_x=16,
            img_shape_y=32,
            channel_names=NAMES,
            in_channels=[0, 1, 2],
            out_channels=[0, 1, 2],
            n_future=0,
            losses=[
                {"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}},
                {"type": "crps", "channel_weights": "constant", "relative_weight": 0.5},
            ],
        )
    )
    handler = LossHandler(params)
    rng = np.random.RandomState(1)
    prd = jnp.asarray(rng.randn(2, 4, 3, 16, 32).astype(np.float32))  # (B, E, C, H, W)
    tar = jnp.asarray(rng.randn(2, 3, 16, 32).astype(np.float32))
    val = float(handler(prd, tar, train=True))
    assert np.isfinite(val)
