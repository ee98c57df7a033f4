"""Metric numerics vs independent numpy references.

Mirrors the reference's test_metrics.py strategy (ref tests/test_metrics.py:
each geometric metric validated against a hand-rolled implementation):
RMSE/L1/ACC against explicit quadrature-weighted numpy formulas, ensemble
CRPS against the O(E^2) pairwise definition, spread against the unbiased
ensemble variance, the rank histogram against a loop-based rank count, plus
the MetricsHandler's batch accumulation / finalize weighting and HDF5 save.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.utils.grids import GridQuadrature
from makani_tpu.utils.metric import MetricsHandler
from makani_tpu.utils.metrics.functions import (
    ensemble_crps,
    ensemble_rank_histogram,
    ensemble_spread,
    weighted_acc,
    weighted_l1,
    weighted_rmse,
)
from makani_tpu.utils.yparams import ParamsBase

H, W, B, C, E = 16, 32, 3, 4, 5


@pytest.fixture(scope="module")
def quad():
    return GridQuadrature("naive", img_shape=(H, W), normalize=True)


@pytest.fixture(scope="module")
def qw(quad):
    w = np.asarray(quad.quad_weight, np.float64)
    return w / w.sum()


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    prd = rng.standard_normal((B, C, H, W)).astype(np.float32)
    tar = rng.standard_normal((B, C, H, W)).astype(np.float32)
    ens = rng.standard_normal((B, E, C, H, W)).astype(np.float32)
    clim = rng.standard_normal((C, H, W)).astype(np.float32) * 0.3
    return prd, tar, ens, clim


def test_weighted_rmse_l1_vs_numpy(quad, qw, data):
    prd, tar, _, _ = data
    got_rmse = np.asarray(weighted_rmse(jnp.asarray(prd), jnp.asarray(tar), quad))
    got_l1 = np.asarray(weighted_l1(jnp.asarray(prd), jnp.asarray(tar), quad))
    want_rmse = np.sqrt(np.sum(qw * (prd - tar).astype(np.float64) ** 2, axis=(-2, -1)))
    want_l1 = np.sum(qw * np.abs(prd - tar).astype(np.float64), axis=(-2, -1))
    np.testing.assert_allclose(got_rmse, want_rmse, rtol=1e-5)
    np.testing.assert_allclose(got_l1, want_l1, rtol=1e-5)


def test_weighted_acc_vs_numpy(quad, qw, data):
    prd, tar, _, clim = data
    got = np.asarray(weighted_acc(jnp.asarray(prd), jnp.asarray(tar), quad, clim=jnp.asarray(clim)))
    pa = (prd - clim).astype(np.float64)
    ta = (tar - clim).astype(np.float64)
    num = np.sum(qw * pa * ta, axis=(-2, -1))
    den = np.sqrt(np.sum(qw * pa**2, axis=(-2, -1)) * np.sum(qw * ta**2, axis=(-2, -1)))
    np.testing.assert_allclose(got, num / den, rtol=1e-4)
    # perfect forecast has ACC 1
    perfect = np.asarray(weighted_acc(jnp.asarray(tar), jnp.asarray(tar), quad, clim=jnp.asarray(clim)))
    np.testing.assert_allclose(perfect, 1.0, atol=1e-5)


def test_ensemble_crps_vs_pairwise(quad, qw, data):
    """Fair CRPS == E|X-y| - 1/(2 E (E-1)) sum_{i,j} |x_i - x_j| pointwise,
    then quadrature-averaged."""
    _, tar, ens, _ = data
    got = np.asarray(ensemble_crps(jnp.asarray(ens), jnp.asarray(tar), quad, fair=True))
    e64 = ens.astype(np.float64)
    term1 = np.mean(np.abs(e64 - tar[:, None]), axis=1)
    pair = np.abs(e64[:, :, None] - e64[:, None, :])  # (B, E, E, C, H, W)
    term2 = pair.sum(axis=(1, 2)) / (2.0 * E * (E - 1))
    want = np.sum(qw * (term1 - term2), axis=(-2, -1))
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # biased (fair=False) variant uses 1/(2 E^2)
    got_b = np.asarray(ensemble_crps(jnp.asarray(ens), jnp.asarray(tar), quad, fair=False))
    want_b = np.sum(qw * (term1 - pair.sum(axis=(1, 2)) / (2.0 * E * E)), axis=(-2, -1))
    np.testing.assert_allclose(got_b, want_b, rtol=1e-4)


def test_ensemble_spread_vs_numpy(quad, qw, data):
    _, _, ens, _ = data
    got = np.asarray(ensemble_spread(jnp.asarray(ens), quad))
    var = np.var(ens.astype(np.float64), axis=1, ddof=1)
    want = np.sqrt(np.sum(qw * var, axis=(-2, -1)) + 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_rank_histogram_vs_loop(quad, qw, data):
    _, tar, ens, _ = data
    got = np.asarray(ensemble_rank_histogram(jnp.asarray(ens), jnp.asarray(tar), quad))
    assert got.shape == (B, C, E + 1)
    np.testing.assert_allclose(got.sum(axis=-1), 1.0, rtol=1e-5)
    want = np.zeros((B, C, E + 1))
    for b in range(B):
        for c in range(C):
            ranks = np.sum(ens[b, :, c] <= tar[b, c], axis=0)  # (H, W)
            for r in range(E + 1):
                want[b, c, r] = np.sum(qw[0] * (ranks == r)) if qw.ndim == 3 else np.sum(qw * (ranks == r))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rank_histogram_flat_for_exchangeable(quad):
    """Observation drawn from the same distribution as the members ->
    approximately flat histogram."""
    rng = np.random.default_rng(3)
    big = rng.standard_normal((8, 9, 1, H, W)).astype(np.float32)
    ens, obs = big[:, :8], big[:, 8]
    hist = np.asarray(ensemble_rank_histogram(jnp.asarray(ens), jnp.asarray(obs), quad)).mean(axis=(0, 1))
    np.testing.assert_allclose(hist, 1.0 / 9, atol=0.03)


def _handler(metric_names, steps=2):
    params = ParamsBase(
        dict(
            img_shape_x=H,
            img_shape_y=W,
            channel_names=[f"c{i}" for i in range(C)],
            model_grid_type="equiangular",
            metric_names=metric_names,
            valid_autoreg_steps=steps - 1,
        )
    )
    return MetricsHandler(params)


def test_handler_accumulation_weighting(data):
    """Two batches of different sizes must combine as a sample-weighted mean."""
    prd, tar, _, _ = data
    h = _handler(["rmse"], steps=1)
    h.update(jnp.asarray(prd[:1]), jnp.asarray(tar[:1]), step=0)
    h.update(jnp.asarray(prd[1:]), jnp.asarray(tar[1:]), step=0)
    logs = h.finalize()

    quad = h.quadrature
    per_sample = np.asarray(weighted_rmse(jnp.asarray(prd), jnp.asarray(tar), quad))
    want = per_sample.mean()  # equal weight per sample, not per batch
    np.testing.assert_allclose(logs["rmse"], want, rtol=1e-5)
    # per-channel keys
    for c in range(C):
        np.testing.assert_allclose(logs[f"rmse/c{c}"], per_sample[:, c].mean(), rtol=1e-5)


def test_handler_rollout_curve_and_save(tmp_path, data):
    prd, tar, _, _ = data
    h = _handler(["rmse", "l1"], steps=2)
    h.update(jnp.asarray(prd), jnp.asarray(tar), step=0)
    h.update(jnp.asarray(prd * 2), jnp.asarray(tar), step=1)
    logs = h.finalize()
    assert "rmse_rollout/0" in logs and "rmse_rollout/1" in logs and "rmse_rollout_last" in logs
    assert logs["rmse_rollout/1"] > logs["rmse_rollout/0"]

    import h5py

    p = str(tmp_path / "metrics.h5")
    h.save(p)
    with h5py.File(p, "r") as f:
        assert f["rmse"].shape == (2, C)
        assert [n.decode() for n in f["channel"][:]] == [f"c{i}" for i in range(C)]


def test_handler_ensemble_metrics(data):
    _, tar, ens, _ = data
    h = _handler(["crps", "spread", "ssr", "rankhist"], steps=1)
    h.update(jnp.asarray(ens), jnp.asarray(tar), step=0)
    logs = h.finalize()
    assert logs["crps"] > 0 and logs["spread"] > 0 and logs["ssr"] > 0
    assert "rankhist_rmsd" in logs and np.isfinite(logs["rankhist_rmsd"])


def test_masked_metrics_normalization(quad, data):
    """A quadrature-normalized mask restricted to half the sphere must equal
    the unmasked metric computed on that half's integrand weighting."""
    prd, tar, _, _ = data
    mask = np.zeros((1, 1, H, W), np.float32)
    mask[..., : H // 2, :] = 1.0
    qwm = np.asarray(quad.quad_weight)
    norm = float((qwm * mask[0, 0]).sum() / qwm.sum())
    mask_n = mask / norm  # reference convention: divide by its quad integral
    got = np.asarray(weighted_l1(jnp.asarray(prd), jnp.asarray(tar), quad, mask=jnp.asarray(mask_n)))
    w = qwm.astype(np.float64) * mask[0, 0]
    w = w / w.sum()
    want = np.sum(w * np.abs(prd - tar).astype(np.float64), axis=(-2, -1))
    np.testing.assert_allclose(got, want, rtol=1e-4)
