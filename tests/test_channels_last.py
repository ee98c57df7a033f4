"""Channels-last internal layout: parity against the NCHW reference path.

The SFNO family runs its pointwise GEMMs in (B, H, W, C) on TPU (PERF.md:
channel-contracting GEMMs measured 1.6x faster channels-last at 0.25 deg).
Both layouts share one parameter tree (the layout is purely an activation
layout), so these tests check bit-level interchangeability: same params,
same outputs, same grads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from makani_tpu.ops.fft import InverseRealFFT2, RealFFT2
from makani_tpu.ops.sht import InverseRealSHT, RealSHT


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_sht_channels_last_matches_nchw():
    sht = RealSHT(18, 36, lmax=12, mmax=12)
    isht = InverseRealSHT(18, 36, lmax=12, mmax=12)
    x = jnp.asarray(_rand(2, 5, 18, 36))
    x_cl = jnp.transpose(x, (0, 2, 3, 1))

    a = sht.analysis(x)
    a_cl = sht.analysis_cl(x_cl)
    np.testing.assert_allclose(np.transpose(a_cl, (0, 3, 1, 2, 4)), a, atol=1e-6)

    y = isht.synthesis(a)
    y_cl = isht.synthesis_cl(a_cl)
    np.testing.assert_allclose(np.transpose(y_cl, (0, 3, 1, 2)), y, atol=1e-5)


def test_fft2_channels_last_matches_nchw():
    f = RealFFT2(18, 36, lmax=10, mmax=9)
    fi = InverseRealFFT2(18, 36, lmax=10, mmax=9)
    x = jnp.asarray(_rand(2, 5, 18, 36))
    x_cl = jnp.transpose(x, (0, 2, 3, 1))

    a = f.analysis(x)
    a_cl = f.analysis_cl(x_cl)
    np.testing.assert_allclose(np.transpose(a_cl, (0, 3, 1, 2, 4)), a, atol=1e-5)

    y = fi.synthesis(a)
    y_cl = fi.synthesis_cl(a_cl)
    np.testing.assert_allclose(np.transpose(y_cl, (0, 3, 1, 2)), y, atol=1e-5)


@pytest.mark.parametrize("operator_type,filter_type", [("dhconv", "linear"), ("diagonal", "linear"), ("diagonal", "non-linear")])
def test_sfno_channels_last_parity(operator_type, filter_type):
    from makani_tpu.models.networks.sfnonet import SphericalFourierNeuralOperatorNet as SFNO

    kw = dict(
        inp_shape=(18, 36),
        out_shape=(18, 36),
        scale_factor=2,
        inp_chans=5,
        out_chans=5,
        embed_dim=16,
        num_layers=2,
        operator_type=operator_type,
        filter_type=filter_type,
        normalization_layer="instance_norm",
        pos_embed="frequency",
        big_skip=True,
    )
    m0 = SFNO(channels_last=False, **kw)
    m1 = SFNO(channels_last=True, **kw)
    x = jnp.asarray(_rand(2, 5, 18, 36, seed=1))

    p0 = m0.init(jax.random.PRNGKey(0), x)
    p1 = m1.init(jax.random.PRNGKey(0), x)
    # one parameter tree serves both layouts (frequency pos-embed params are
    # layout-independent; only pos_embed="direct" stores a layout-shaped param)
    assert jtu.tree_map(lambda a: a.shape, p0) == jtu.tree_map(lambda a: a.shape, p1)

    o0 = m0.apply(p0, x)
    o1 = m1.apply(p0, x)
    scale = float(jnp.abs(o0).max())
    np.testing.assert_allclose(o1, o0, atol=5e-5 * scale)

    g0 = jax.grad(lambda p: jnp.mean(m0.apply(p, x) ** 2))(p0)
    g1 = jax.grad(lambda p: jnp.mean(m1.apply(p, x) ** 2))(p0)
    gmax = max(float(jnp.abs(le).max()) for le in jtu.tree_leaves(g0))
    for (path, a), b in zip(jtu.tree_flatten_with_path(g0)[0], jtu.tree_leaves(g1)):
        # absolute tolerance against the global grad scale: per-leaf relative
        # comparison is meaningless for analytically-zero grads (e.g. fc2 bias
        # ahead of an instance norm, which is shift-invariant)
        np.testing.assert_allclose(a, b, atol=5e-4 * gmax, err_msg=jtu.keystr(path))


def test_sfno_channels_last_bf16_runs():
    from makani_tpu.models.networks.sfnonet import SphericalFourierNeuralOperatorNet as SFNO

    m = SFNO(
        inp_shape=(18, 36),
        out_shape=(18, 36),
        scale_factor=2,
        inp_chans=5,
        out_chans=5,
        embed_dim=16,
        num_layers=2,
        channels_last=True,
        dtype=jnp.bfloat16,
    )
    x = jnp.asarray(_rand(1, 5, 18, 36, seed=2))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_conv1x1_casts_input_to_compute_dtype():
    """The autocast-equivalent entry cast: fp32 activations into a bf16 layer
    must produce a bf16 GEMM, not a silently promoted fp32 one."""
    from makani_tpu.models.common.layers import Conv1x1

    x = jnp.asarray(_rand(1, 4, 6, 8), jnp.float32)
    layer = Conv1x1(8, dtype=jnp.bfloat16)
    p = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(p, x)
    assert out.dtype == jnp.bfloat16


@pytest.mark.parametrize("norm", ["none", "instance_norm_s2"])
def test_fcn3_channels_last_parity(norm):
    """FCN3 processor in channels-last reproduces the NCHW outputs and grads
    with the same parameter tree (VERDICT r3 item 2)."""
    from makani_tpu.models.networks.fourcastnet3 import AtmoSphericNeuralOperatorNet as FCN3

    names = ["u10m", "v10m", "t2m", "u500", "v500", "z500", "u850", "v850", "z850"]
    kw = dict(
        inp_shape=(16, 32),
        out_shape=(16, 32),
        scale_factor=2,
        channel_names=tuple(names),
        aux_channel_names=("szenith",),
        atmo_embed_dim=6,
        surf_embed_dim=6,
        aux_embed_dim=4,
        num_layers=2,
        sfno_block_frequency=2,
        kernel_shape=(3, 3),
        filter_basis_type="morlet th",
        normalization_layer=norm,
        clamp_water=False,
    )
    m0 = FCN3(channels_last=False, **kw)
    m1 = FCN3(channels_last=True, **kw)
    x = jnp.asarray(_rand(2, len(names) + 1, 16, 32, seed=3))

    p0 = m0.init(jax.random.PRNGKey(0), x)
    p1 = m1.init(jax.random.PRNGKey(0), x)
    assert jtu.tree_map(lambda a: a.shape, p0) == jtu.tree_map(lambda a: a.shape, p1)

    o0 = m0.apply(p0, x)
    o1 = m1.apply(p0, x)
    scale = float(jnp.abs(o0).max())
    np.testing.assert_allclose(o1, o0, atol=5e-5 * scale)

    g0 = jax.grad(lambda p: jnp.mean(m0.apply(p, x) ** 2))(p0)
    g1 = jax.grad(lambda p: jnp.mean(m1.apply(p, x) ** 2))(p0)
    gmax = max(float(jnp.abs(le).max()) for le in jtu.tree_leaves(g0))
    for (path, a), b in zip(jtu.tree_flatten_with_path(g0)[0], jtu.tree_leaves(g1)):
        np.testing.assert_allclose(a, b, atol=5e-4 * gmax, err_msg=jtu.keystr(path))
