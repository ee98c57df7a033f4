"""Halo-exchange distributed DISCO vs the serial op (ref distributed test
pattern, tests_distributed_layers.py; op: thd.DistributedDiscreteContinuousConvS2
bound at makani fourcastnet3.py:189-205).

Runs the serial DiscoConvS2 on the full tensor and the shard_map halo
version over virtual CPU meshes; compares basis responses and input
gradients. Covers same-grid, downsampling (encoder), upsampling (decoder),
uneven (prime) latitudes, and polar rows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.ops.disco import DiscoConvS2
from makani_tpu.parallel import mesh as pmesh
from makani_tpu.parallel.disco import DistributedDiscoConvS2, make_disco_conv


MESHES = [dict(h=2, w=2), dict(h=4, w=1), dict(h=1, w=4), dict(h=2, w=1)]
SHAPES = [
    ((16, 32), (16, 32)),  # same grid (FCN3 local block)
    ((24, 48), (12, 24)),  # 2x downsample (encoder)
    ((12, 24), (24, 48)),  # 2x upsample (decoder)
    ((19, 32), (19, 32)),  # prime lat: padded sharding
]


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()


def _init(cfg):
    n = 2
    for v in cfg.values():
        n *= v
    pmesh.init(batch=2, devices=jax.devices()[:n], **cfg)


@pytest.mark.parametrize("cfg", MESHES, ids=lambda c: f"h{c['h']}w{c['w']}")
@pytest.mark.parametrize("shapes", SHAPES, ids=lambda s: f"{s[0][0]}x{s[0][1]}to{s[1][0]}x{s[1][1]}")
def test_distributed_disco_matches_serial(cfg, shapes):
    in_shape, out_shape = shapes
    serial = DiscoConvS2(in_shape, out_shape, (3, 4))
    rng = np.random.RandomState(0)
    B, C = 2, 3  # odd C: the lon halo needs no channel divisibility
    x = jnp.asarray(rng.randn(B, C, *in_shape).astype(np.float32))
    ref = np.asarray(serial(x))

    _init(cfg)
    dist = DistributedDiscoConvS2(in_shape, out_shape, (3, 4))
    assert dist.polar_rows == serial.polar_rows
    out = np.asarray(jax.jit(dist)(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_distributed_disco_gradients_match_serial():
    in_shape, out_shape = (24, 48), (12, 24)
    serial = DiscoConvS2(in_shape, out_shape, (3, 4))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 3, *in_shape).astype(np.float32))
    # weight the loss so the gradient is row-structured (halo-sensitive)
    wgt = jnp.asarray(rng.randn(1, 1, serial.K, out_shape[0], out_shape[1]).astype(np.float32))

    g_ref = np.asarray(jax.grad(lambda v: jnp.sum(serial(v) * wgt))(x))

    _init(dict(h=2, w=2))
    dist = DistributedDiscoConvS2(in_shape, out_shape, (3, 4))
    g = np.asarray(jax.grad(lambda v: jnp.sum(dist(v) * wgt))(x))
    np.testing.assert_allclose(g, g_ref, atol=2e-5)


def test_make_disco_conv_dispatch():
    in_shape = (16, 32)
    assert type(make_disco_conv(in_shape, in_shape, (3, 4))) is DiscoConvS2
    _init(dict(h=2, w=1))
    assert isinstance(make_disco_conv(in_shape, in_shape, (3, 4)), DistributedDiscoConvS2)
    import os

    os.environ["MAKANI_DISCO_HALO"] = "0"
    try:
        assert type(make_disco_conv(in_shape, in_shape, (3, 4))) is DiscoConvS2
    finally:
        del os.environ["MAKANI_DISCO_HALO"]


def test_halo_sizes_are_tight():
    """The lat halo must stay a small band, not a wide gather."""
    _init(dict(h=4, w=1))
    dist = DistributedDiscoConvS2((24, 48), (24, 48), (3, 4))
    assert dist.HU + dist.HD <= 2 * dist.BL


@pytest.mark.parametrize("cfg", MESHES, ids=lambda c: f"h{c['h']}w{c['w']}")
@pytest.mark.parametrize("shapes", SHAPES, ids=lambda s: f"{s[0][0]}x{s[0][1]}to{s[1][0]}x{s[1][1]}")
def test_distributed_fused_matches_serial_fused(cfg, shapes):
    """The weight-fused halo path (no response tensor, no cross-shard
    contraction) must match the serial fused conv in values."""
    in_shape, out_shape = shapes
    serial = DiscoConvS2(in_shape, out_shape, (3, 4))
    rng = np.random.RandomState(2)
    B, g, og, ig = 2, 3, 2, 2
    x = jnp.asarray(rng.randn(B, g * ig, *in_shape).astype(np.float32))
    w = jnp.asarray(rng.randn(g, og, ig, serial.K).astype(np.float32))
    ref = np.asarray(serial.fused(x, w))

    _init(cfg)
    dist = DistributedDiscoConvS2(in_shape, out_shape, (3, 4))
    assert dist.supports_fused
    out = np.asarray(jax.jit(dist.fused)(x, w))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_distributed_fused_gradients_match_serial():
    """Input AND weight gradients of the fused halo path vs the serial op."""
    in_shape, out_shape = (12, 24), (24, 48)  # decoder-style upsample
    serial = DiscoConvS2(in_shape, out_shape, (3, 4))
    rng = np.random.RandomState(3)
    g, og, ig = 2, 3, 2
    x = jnp.asarray(rng.randn(2, g * ig, *in_shape).astype(np.float32))
    w = jnp.asarray(rng.randn(g, og, ig, serial.K).astype(np.float32))
    wgt = jnp.asarray(rng.randn(1, g * og, out_shape[0], out_shape[1]).astype(np.float32))

    gx_ref, gw_ref = jax.grad(lambda v, q: jnp.sum(serial.fused(v, q) * wgt), argnums=(0, 1))(x, w)

    _init(dict(h=2, w=2))
    dist = DistributedDiscoConvS2(in_shape, out_shape, (3, 4))
    gx, gw = jax.grad(lambda v, q: jnp.sum(dist.fused(v, q) * wgt), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=3e-4)
