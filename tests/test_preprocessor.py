"""Preprocessor + stepper + metrics tests (ref makani tests/test_preprocessor.py,
test_stepper.py, test_metrics.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.preprocessor import Preprocessor2D
from makani_tpu.utils.yparams import ParamsBase


def make_pre(**kw):
    base = dict(img_shape_x=8, img_shape_y=16, n_history=1, channel_names=["a", "b"], model_grid_type="equiangular")
    base.update(kw)
    return Preprocessor2D(ParamsBase(base))


def test_history_flatten_expand_roundtrip():
    pre = make_pre()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 2, 3, 8, 16).astype(np.float32))
    flat = pre.flatten_history(x)
    assert flat.shape == (2, 6, 8, 16)
    back = pre.expand_history(flat, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_append_history_slides_window():
    pre = make_pre(n_history=1)
    rng = np.random.RandomState(1)
    s0, s1, s2 = [rng.randn(2, 3, 8, 16).astype(np.float32) for _ in range(3)]
    x = pre.flatten_history(jnp.asarray(np.stack([s0, s1], axis=1)))
    new = pre.append_history(x, jnp.asarray(s2), step=0)
    expect = pre.flatten_history(jnp.asarray(np.stack([s1, s2], axis=1)))
    np.testing.assert_allclose(np.asarray(new), np.asarray(expect))


def test_append_channels_per_timestep():
    pre = make_pre(n_history=1)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 2, 3, 8, 16).astype(np.float32))
    zen = jnp.asarray(rng.randn(2, 2, 1, 8, 16).astype(np.float32))
    flat = pre.flatten_history(x)
    out = pre.append_channels(flat, zen)
    assert out.shape == (2, 8, 8, 16)  # (3+1 channels) x 2 timesteps
    exp = pre.flatten_history(jnp.concatenate([x, zen], axis=2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp))


def test_static_features_grid_embedding():
    pre = make_pre(add_grid=True, gridtype="sinusoidal", grid_num_frequencies=2, n_history=0)
    assert pre.n_static_channels == 8  # 2 freq x (sin+cos) x (lat, lon)
    x = jnp.zeros((3, 2, 8, 16))
    out = pre.add_static_features(x)
    assert out.shape == (3, 10, 8, 16)
    back = pre.remove_static_features(out)
    assert back.shape == (3, 2, 8, 16)


def test_history_normalization_modes():
    pre = make_pre(n_history=1, history_normalization_mode="mean")
    rng = np.random.RandomState(3)
    x = pre.flatten_history(jnp.asarray(rng.randn(2, 2, 3, 8, 16).astype(np.float32) * 5 + 2))
    stats = pre.history_compute_stats(x)
    xn = pre.history_normalize(x, stats)
    # normalized history has ~zero mean / unit variance spatially
    xe = np.asarray(pre.expand_history(xn, 2))
    assert abs(xe.mean()) < 0.3
    # denormalize round-trips the last-step channels
    xd = pre.history_denormalize(xn[:, -3:], stats)
    np.testing.assert_allclose(np.asarray(xd), np.asarray(x[:, -3:]), atol=1e-3, rtol=1e-3)


def test_metrics_handler_ensemble():
    from makani_tpu.utils.metric import MetricsHandler

    params = ParamsBase(
        dict(
            img_shape_x=16,
            img_shape_y=32,
            channel_names=["a", "b"],
            valid_autoreg_steps=1,
            metric_names=["rmse", "acc", "crps", "spread", "ssr"],
        )
    )
    mh = MetricsHandler(params)
    rng = np.random.RandomState(0)
    tar = jnp.asarray(rng.randn(4, 2, 16, 32).astype(np.float32))
    ens = tar[:, None] + 0.1 * jnp.asarray(rng.randn(4, 8, 2, 16, 32).astype(np.float32))
    mh.update(ens, tar, 0)
    mh.update(ens, tar, 1)
    logs = mh.finalize()
    assert 0 < logs["rmse"] < 0.2
    assert logs["crps"] < logs["rmse"]
    # well-calibrated-ish ensemble: SSR order 1
    assert 0.3 < logs["ssr"] < 3.0


def test_rank_histogram_calibration():
    """A calibrated ensemble gives a ~flat rank histogram; a biased one piles
    ranks into the end bins (ref functions.py GeometricRankHistogram)."""
    from makani_tpu.utils.grids import GridQuadrature
    from makani_tpu.utils.metrics.functions import ensemble_rank_histogram

    quad = GridQuadrature("naive", img_shape=(16, 32), normalize=True)
    rng = np.random.RandomState(0)
    E = 7
    ens = jnp.asarray(rng.randn(4, E, 2, 16, 32).astype(np.float32))
    obs = jnp.asarray(rng.randn(4, 2, 16, 32).astype(np.float32))
    hist = np.asarray(ensemble_rank_histogram(ens, obs, quad))
    assert hist.shape == (4, 2, E + 1)
    np.testing.assert_allclose(hist.sum(-1), 1.0, rtol=1e-5)
    # exchangeable obs/members: every rank equally likely
    np.testing.assert_allclose(hist.mean((0, 1)), 1.0 / (E + 1), atol=0.03)
    # warm-biased ensemble: observation lands below all members
    hist_b = np.asarray(ensemble_rank_histogram(ens + 5.0, obs, quad))
    assert hist_b[..., 0].mean() > 0.99


def test_metrics_handler_rankhist():
    from makani_tpu.utils.metric import MetricsHandler

    params = ParamsBase(
        dict(img_shape_x=16, img_shape_y=32, channel_names=["a", "b"], valid_autoreg_steps=0, metric_names=["rmse", "rankhist"])
    )
    mh = MetricsHandler(params)
    rng = np.random.RandomState(1)
    tar = jnp.asarray(rng.randn(4, 2, 16, 32).astype(np.float32))
    ens = jnp.asarray(rng.randn(4, 8, 2, 16, 32).astype(np.float32))
    mh.update(ens, tar, 0)
    logs = mh.finalize()
    assert "rankhist_rmsd" in logs and logs["rankhist_rmsd"] < 0.3
    assert mh.rollout_curves["rankhist"].shape == (1, 2, 9)


def test_zenith_angle_matches_subsolar_point():
    """cos zenith is max where the sun is overhead; check the subsolar lat
    tracks the declination sign by season."""
    import datetime

    from makani_tpu.utils.zenith_angle import cos_zenith_angle

    lats = np.linspace(90, -90, 73)
    lons = np.linspace(0, 360, 144, endpoint=False)
    cz_jul = cos_zenith_angle(datetime.datetime(2020, 7, 1, 12, tzinfo=datetime.timezone.utc), lons, lats)
    cz_jan = cos_zenith_angle(datetime.datetime(2020, 1, 1, 12, tzinfo=datetime.timezone.utc), lons, lats)
    lat_jul = lats[np.unravel_index(np.argmax(cz_jul), cz_jul.shape)[0]]
    lat_jan = lats[np.unravel_index(np.argmax(cz_jan), cz_jan.shape)[0]]
    assert lat_jul > 15 and lat_jan < -15


def test_multistep_scan_matches_unrolled():
    """use_scan=True rollout equals the Python-unrolled rollout."""
    from makani_tpu.models.model_registry import get_model

    base = dict(
        nettype="SFNO",
        img_shape_x=16,
        img_shape_y=32,
        scale_factor=2,
        embed_dim=16,
        num_layers=2,
        channel_names=["a", "b", "c"],
        in_channels=[0, 1, 2],
        out_channels=[0, 1, 2],
        n_history=1,
        n_future=2,
        add_zenith=True,
        normalization_layer="instance_norm",
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 16, 32).astype(np.float32))
    zen = jnp.asarray(rng.randn(2, 4, 1, 16, 32).astype(np.float32))

    m1, _ = get_model(ParamsBase(dict(base, multistep={"push_forward": False})), multistep=True)
    m2, _ = get_model(ParamsBase(dict(base, multistep={"push_forward": False, "use_scan": True})), multistep=True)
    p = m1.init(jax.random.PRNGKey(0), x, zen)
    y1 = m1.apply(p, x, zen, train=True)
    y2 = m2.apply(p, x, zen, train=True)
    assert y1.shape == y2.shape == (2, 9, 16, 32)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)
    # eval path is unaffected (single step)
    e2 = m2.apply(p, x, zen[:, :2], train=False)
    assert e2.shape == (2, 3, 16, 32)


def test_static_soiltype_onehot(tmp_path):
    import h5py

    st = np.zeros((8, 16), np.float32)
    st[2:5] = 3.0
    st[6:] = 7.0
    p = str(tmp_path / "soiltype.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("slt", data=st[None])
    pre = make_pre(n_history=0, add_soiltype=True, soiltype_path=p)
    assert pre.n_static_channels == 8
    x = jnp.zeros((2, 2, 8, 16))
    out = np.asarray(pre.add_static_features(x))
    assert out.shape == (2, 10, 8, 16)
    # one-hot: class 3 rows flag channel 3, sea rows channel 0
    assert out[0, 2 + 3, 3, 0] == 1.0 and out[0, 2 + 0, 0, 0] == 1.0
    np.testing.assert_allclose(out[:, 2:].sum(axis=1), 1.0)


def test_static_copernicus_embedding(tmp_path):
    emb = np.random.RandomState(0).randn(8, 16, 8).astype(np.float32)  # (H, W, 8)
    p = str(tmp_path / "cop.npy")
    np.save(p, emb)
    pre = make_pre(n_history=0, add_copernicus_emb=True, copernicus_emb_path=p)
    assert pre.n_static_channels == 8
    x = jnp.zeros((1, 2, 8, 16))
    out = np.asarray(pre.add_static_features(x))
    np.testing.assert_allclose(out[0, 2:], np.transpose(emb, (2, 0, 1)), atol=1e-6)
