"""FCN3.1 (ref fourcastnet3_1.py:641-1133): unified encoder/decoder over all
channels, learnable latitude position embedding, n_history support, lmax-based
DISCO cutoffs, nodal basis norm, fourier-bessel basis, learned SST imputation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from makani_tpu.models.model_registry import get_model
from makani_tpu.utils.yparams import ParamsBase

NAMES = ["u10m", "v10m", "t2m", "sst", "z500", "q500"]


def _params(**over):
    # reference-shaped config keys (embed_dim / pos_embed_dim / encoder_bias,
    # ref net signature fourcastnet3_1.py:653-694)
    cfg = dict(
        nettype="FCN3.1",
        img_shape_x=16,
        img_shape_y=32,
        scale_factor=2,
        embed_dim=8,
        aux_embed_dim=4,
        pos_embed_dim=3,
        encoder_bias=False,
        filter_basis_type="harmonic",
        filter_basis_norm_mode="nodal",
        activation_function="sin",
        hard_thresholding_fraction=1.0,
        num_layers=2,
        kernel_shape=[2, 3],
        channel_names=NAMES,
        in_channels=list(range(len(NAMES))),
        out_channels=list(range(len(NAMES))),
        n_history=0,
        n_future=0,
        add_zenith=True,
        losses=[{"type": "l2"}],
        lr=1e-3,
        optimizer_type="Adam",
        scheduler="none",
        multistep={"push_forward": False},
    )
    cfg.update(over)
    return ParamsBase(cfg)


def _param_names(p):
    return [jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(p)[0]]


def test_fcn31_unified_encoder_and_pos_embed():
    """FCN3.1 is the restructured net: ONE encoder/decoder over all channels
    (no atmo/surf groups) plus a learnable latitude position embedding."""
    model, _ = get_model(_params(), multistep=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, len(NAMES), 16, 32).astype(np.float32))
    zen = jnp.asarray(rng.randn(1, 1, 1, 16, 32).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x, zen)
    names_p = _param_names(p)
    assert any("'encoder'" in n for n in names_p)
    assert any("'decoder'" in n for n in names_p)
    assert not any("atmo_encoder" in n or "surf_encoder" in n for n in names_p)
    # latitude position embedding: (1, pos_embed_dim, h, 1)
    pe = [l for k, l in jtu.tree_flatten_with_path(p)[0] if "pos_embed" in jtu.keystr(k)]
    assert len(pe) == 1 and pe[0].shape == (1, 3, 8, 1)
    out = model.apply(p, x, zen, train=False)
    assert out.shape == (1, len(NAMES), 16, 32) and bool(jnp.isfinite(out).all())


def test_fcn31_n_history():
    """n_history > 0: the unified encoder consumes every history copy
    (FCN3 raises on it, ref parity)."""
    model, pre = get_model(_params(n_history=1), multistep=True)
    rng = np.random.RandomState(3)
    C = len(NAMES)
    x = jnp.asarray(rng.randn(1, 2 * C, 16, 32).astype(np.float32))  # 2 history steps flattened
    zen = jnp.asarray(rng.randn(1, 2, 1, 16, 32).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x, zen)
    out = model.apply(p, x, zen, train=False)
    assert out.shape == (1, C, 16, 32) and bool(jnp.isfinite(out).all())

    # FCN3 must reject history inputs
    m3, _ = get_model(_params(nettype="FCN3", n_history=1, atmo_embed_dim=4, surf_embed_dim=6), multistep=True)
    with pytest.raises(ValueError, match="FCN3.1"):
        m3.init(jax.random.PRNGKey(0), x, zen)


def test_fcn31_fourier_bessel_nodal_big_skip():
    model, _ = get_model(
        _params(filter_basis_type="fourier-bessel", big_skip=True, clamp_water=True), multistep=True
    )
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, len(NAMES), 16, 32).astype(np.float32))
    zen = jnp.asarray(rng.randn(1, 1, 1, 16, 32).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x, zen)
    out = model.apply(p, x, zen, train=False)
    assert bool(jnp.isfinite(out).all())
    g = jax.grad(lambda q: jnp.mean(model.apply(q, x, zen, train=True) ** 2))(p)
    gmax = max(float(jnp.abs(le).max()) for le in jtu.tree_leaves(g))
    assert np.isfinite(gmax) and gmax > 0


def test_fcn31_builds_from_reference_yaml():
    """The reference-shaped YAML recipe builds the net (shapes shrunk)."""
    from makani_tpu.utils.yparams import YParams

    params = YParams("config/fourcastnet3.yaml", "fcn31_sc2_edim256_layers10")
    params["img_shape_x"], params["img_shape_y"] = 16, 32
    params["embed_dim"], params["aux_embed_dim"], params["pos_embed_dim"] = 8, 4, 2
    params["num_layers"] = 2
    params["kernel_shape"] = [2, 3]
    params["channel_names"] = NAMES
    params["in_channels"] = list(range(len(NAMES)))
    params["out_channels"] = list(range(len(NAMES)))
    params["input_noise"] = None
    params["lmax"] = None
    model, _ = get_model(params, multistep=True)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, len(NAMES), 16, 32).astype(np.float32))
    zen = jnp.asarray(rng.randn(1, 1, 1, 16, 32).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x, zen)
    assert bool(jnp.isfinite(model.apply(p, x, zen, train=False)).all())


def test_fcn31_imputes_nan_sst_and_runs():
    model, _ = get_model(_params(), multistep=True)
    rng = np.random.RandomState(0)
    x = rng.randn(1, len(NAMES), 16, 32).astype(np.float32)
    x[:, NAMES.index("sst"), :8, :] = np.nan  # land half
    xj = jnp.asarray(x)
    zen = jnp.asarray(rng.randn(1, 1, 1, 16, 32).astype(np.float32))

    p = model.init(jax.random.PRNGKey(0), xj, zen)
    names_p = [jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(p)[0]]
    assert any("sst_imputation" in n for n in names_p)

    out = model.apply(p, xj, zen, train=False)
    assert bool(jnp.isfinite(out).all())

    # gradients flow through the imputation (trainable end-to-end with NaNs)
    g = jax.grad(lambda q: jnp.mean(model.apply(q, xj, zen, train=True) ** 2))(p)
    gmax = max(float(jnp.abs(le).max()) for le in jtu.tree_leaves(g))
    assert np.isfinite(gmax) and gmax > 0


def test_fcn31_no_sst_channel_skips_imputation():
    names = [n for n in NAMES if n != "sst"]
    model, _ = get_model(
        _params(channel_names=names, in_channels=list(range(len(names))), out_channels=list(range(len(names)))),
        multistep=True,
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, len(names), 16, 32).astype(np.float32))
    zen = jnp.asarray(rng.randn(1, 1, 1, 16, 32).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x, zen)
    names_p = [jtu.keystr(k) for k, _ in jtu.tree_flatten_with_path(p)[0]]
    assert not any("sst_imputation" in n for n in names_p)
    assert bool(jnp.isfinite(model.apply(p, x, zen, train=False)).all())


def test_mlp_imputation_preserves_valid_data():
    from makani_tpu.models.common.imputation import MLPImputation

    imp = MLPImputation(inp_chans=3, impute_chans=(1,))
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 8, 16).astype(np.float32)
    x[:, 1, :4] = np.nan
    xj = jnp.asarray(x)
    p = imp.init(jax.random.PRNGKey(0), xj)
    y = np.asarray(imp.apply(p, xj))
    assert np.isfinite(y).all()
    # valid positions untouched
    np.testing.assert_array_equal(y[:, 1, 4:], x[:, 1, 4:])
    np.testing.assert_array_equal(y[:, 0], x[:, 0])
    np.testing.assert_array_equal(y[:, 2], x[:, 2])


def test_fcn31_channels_last_parity():
    """Channels-last processor reproduces NCHW outputs/grads with the same
    parameter tree (VERDICT r3 item 2)."""
    m0, _ = get_model(_params(channels_last=False), multistep=True)
    m1, _ = get_model(_params(channels_last=True), multistep=True)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, len(NAMES), 16, 32).astype(np.float32))
    zen = jnp.asarray(rng.randn(2, 1, 1, 16, 32).astype(np.float32))

    p0 = m0.init(jax.random.PRNGKey(0), x, zen)
    p1 = m1.init(jax.random.PRNGKey(0), x, zen)
    assert jtu.tree_map(lambda a: a.shape, p0) == jtu.tree_map(lambda a: a.shape, p1)

    o0 = m0.apply(p0, x, zen, train=False)
    o1 = m1.apply(p0, x, zen, train=False)
    scale = float(jnp.abs(o0).max())
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), atol=5e-5 * scale)

    g0 = jax.grad(lambda p: float(0) + jnp.mean(m0.apply(p, x, zen, train=False) ** 2))(p0)
    g1 = jax.grad(lambda p: float(0) + jnp.mean(m1.apply(p, x, zen, train=False) ** 2))(p0)
    gmax = max(float(jnp.abs(le).max()) for le in jtu.tree_leaves(g0))
    for (path, a), b in zip(jtu.tree_flatten_with_path(g0)[0], jtu.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4 * gmax, err_msg=jtu.keystr(path))


def test_fcn31_decoder_row_order_matches_reference():
    """Decoder rows are in the reference's pred_channels order (surf then
    atmo, ref fourcastnet3_1.py:961) before the dataset-order scatter, so
    imported decoder weights align row-for-row without permutation."""
    from makani_tpu.models.networks.fourcastnet3_1 import AtmoSphericNeuralOperatorNet31
    from makani_tpu.utils.features import get_channel_groups

    net = AtmoSphericNeuralOperatorNet31(
        channel_names=tuple(NAMES), aux_channel_names=("xzen0",), n_history=0,
    )
    in_idx, aux_idx, pred_idx, resid_idx, sst_in, lsm_in, n_prog = net._channel_bookkeeping()
    atmo, surf, _, _, _ = get_channel_groups(list(NAMES), [])
    assert pred_idx == list(surf) + list(atmo)
    # in_channels likewise mirror ref in_channels = surf_in + atmo_in
    assert in_idx == list(surf) + list(atmo)
