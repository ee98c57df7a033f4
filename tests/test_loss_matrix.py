"""Loss parameter-matrix cross-validation against brute-force fp64 numpy
(the reference validates every loss across option combinations,
ref tests/test_losses.py; here the reference implementation is a direct
quadrature sum recomputed per case).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.utils.grids import GridQuadrature, grid_to_quadrature_rule
from makani_tpu.utils.losses.crps_loss import CRPSLoss
from makani_tpu.utils.losses.lp_loss import GeometricLpLoss, SpectralLpLoss

H, W, B, C = 17, 36, 2, 3
NAMES = ["u10m", "v10m", "t2m"]


def _quad_weights(grid_type, crop_shape=None, crop_offset=(0, 0)):
    q = GridQuadrature(
        grid_to_quadrature_rule(grid_type), img_shape=(H, W), crop_shape=crop_shape, crop_offset=crop_offset, normalize=True
    )
    return np.asarray(q.quad_weight, np.float64).reshape(-1)[: H * W].reshape(H, W) if np.asarray(q.quad_weight).size == H * W else np.asarray(q.quad_weight, np.float64)


@pytest.mark.parametrize("grid_type", ["equiangular", "legendre-gauss"])
@pytest.mark.parametrize("p", [1.0, 2.0, 3.0])
@pytest.mark.parametrize("relative", [False, True])
@pytest.mark.parametrize("squared", [False, True])
def test_geometric_lp_matrix_vs_numpy(grid_type, p, relative, squared):
    rng = np.random.RandomState(hash((grid_type, p, relative, squared)) % 2**31)
    prd = rng.randn(B, C, H, W)
    tar = rng.randn(B, C, H, W)

    loss = GeometricLpLoss(
        img_shape=(H, W), channel_names=NAMES, grid_type=grid_type, p=p, relative=relative, squared=squared
    )
    got = np.asarray(loss(jnp.asarray(prd, jnp.float32), jnp.asarray(tar, jnp.float32)), np.float64)

    qw = _quad_weights(grid_type)
    norms = (np.abs(prd - tar) ** p * qw).sum(axis=(-2, -1))
    if relative:
        norms = norms / ((np.abs(tar) ** p * qw).sum(axis=(-2, -1)) + 1e-6)
    if not squared:
        norms = norms ** (1.0 / p)
    np.testing.assert_allclose(got, norms.reshape(B, -1), rtol=2e-4, atol=1e-6)


def test_geometric_lp_crop_tiles_partition_the_sphere():
    """Crop quadrature selects the tile of the GLOBAL normalized weight map
    and consumes the local tile field (the spatial-parallel convention:
    each rank integrates its shard, then psums). Squared-L2 tile losses on
    the four quadrant shards must therefore sum to the full-grid loss."""
    rng = np.random.RandomState(0)
    prd = rng.randn(B, C, H, W).astype(np.float32)
    tar = rng.randn(B, C, H, W).astype(np.float32)

    full = GeometricLpLoss(img_shape=(H, W), channel_names=NAMES, p=2.0, squared=True)
    total = np.asarray(full(jnp.asarray(prd), jnp.asarray(tar)), np.float64)

    h2, w2 = H // 2, W // 2
    tiles = [
        ((h2, w2), (0, 0)),
        ((h2, W - w2), (0, w2)),
        ((H - h2, w2), (h2, 0)),
        ((H - h2, W - w2), (h2, w2)),
    ]
    acc = np.zeros_like(total)
    for shape, off in tiles:
        tl = GeometricLpLoss(
            img_shape=(H, W), crop_shape=shape, crop_offset=off, channel_names=NAMES, p=2.0, squared=True
        )
        sl = (slice(off[0], off[0] + shape[0]), slice(off[1], off[1] + shape[1]))
        acc = acc + np.asarray(
            tl(jnp.asarray(prd[..., sl[0], sl[1]]), jnp.asarray(tar[..., sl[0], sl[1]])), np.float64
        )
    np.testing.assert_allclose(acc, total, rtol=3e-4, atol=1e-6)


def test_geometric_lp_channel_weight_hook():
    """The wgt argument scales the integrand pointwise (used by the mask and
    randomized-weight paths)."""
    rng = np.random.RandomState(1)
    prd = rng.randn(B, C, H, W).astype(np.float32)
    tar = rng.randn(B, C, H, W).astype(np.float32)
    wgt = np.abs(rng.randn(1, C, H, W)).astype(np.float32)

    loss = GeometricLpLoss(img_shape=(H, W), channel_names=NAMES, p=2.0, squared=True)
    got = np.asarray(loss(jnp.asarray(prd), jnp.asarray(tar), wgt=jnp.asarray(wgt)), np.float64)

    qw = _quad_weights("equiangular")
    expect = ((prd - tar) ** 2 * wgt * qw).sum(axis=(-2, -1))
    np.testing.assert_allclose(got, expect.reshape(B, -1), rtol=2e-4, atol=1e-6)



@pytest.mark.parametrize("crps_type", ["cdf", "skillspread", "probability weighted moment"])
def test_crps_loss_quadrature_reduction_vs_numpy(crps_type):
    """CRPSLoss reduces the pointwise kernel with the same normalized
    quadrature — cross-check the full (B, C) output against fp64 numpy."""
    from makani_tpu.utils.losses.crps_loss import crps_ensemble

    E = 5
    rng = np.random.RandomState(3)
    fc = rng.randn(B, E, C, H, W).astype(np.float32)
    ob = rng.randn(B, C, H, W).astype(np.float32)

    loss = CRPSLoss(img_shape=(H, W), channel_names=NAMES, crps_type=crps_type)
    got = np.asarray(loss(jnp.asarray(fc), jnp.asarray(ob)), np.float64)

    # pointwise kernel (already validated vs exact pairwise enumeration)
    pt = np.asarray(
        crps_ensemble(jnp.asarray(ob), jnp.moveaxis(jnp.asarray(fc), 1, -1), crps_type), np.float64
    )  # (B, C, H, W)
    qw = _quad_weights("equiangular")
    expect = (pt * qw).sum(axis=(-2, -1))
    np.testing.assert_allclose(got.reshape(B, C), expect, rtol=3e-4, atol=1e-6)
