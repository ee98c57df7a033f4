"""Quadrature rules and grid utilities (ref tests/test_metrics.py
TestMetrics.test_weight_normalization runs every grid type; this suite goes
further: polynomial exactness orders of each rule on its own nodes, the
crop-partition identity that underlies sharded quadrature, padded-latitude
zero weighting, layout equivalence, and BandLimitMask projection identities).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.ops.quadrature import (
    clenshaw_curtiss_weights,
    legendre_gauss_weights,
    precompute_latitudes,
)
from makani_tpu.utils.grids import BandLimitMask, GridQuadrature, grid_to_quadrature_rule, quadrature_weights

RULES = ["naive", "clenshaw-curtiss", "legendre-gauss", "weatherbench2", "uniform"]


@pytest.mark.parametrize("rule", RULES)
@pytest.mark.parametrize("shape", [(17, 36), (32, 64)])
def test_weights_sum_to_sphere_area(rule, shape):
    w = quadrature_weights(rule, shape)
    np.testing.assert_allclose(w.sum(), 4.0 * np.pi, rtol=1e-6)
    wn = quadrature_weights(rule, shape, normalize=True)
    np.testing.assert_allclose(wn.sum(), 1.0, rtol=1e-6)
    assert w.min() >= 0.0


def _nodes_costheta(rule, nlat):
    """cos(theta) at each rule's latitude nodes, north-to-south."""
    if rule == "legendre-gauss":
        x, _ = legendre_gauss_weights(nlat)
        return x[::-1]  # north-to-south like the weight map
    if rule == "clenshaw-curtiss":
        x, _ = clenshaw_curtiss_weights(nlat)
        return x
    # naive / weatherbench2 live on the equiangular endpoint grid
    return np.cos(np.linspace(0, np.pi, nlat))


@pytest.mark.parametrize(
    "rule, degree, tol",
    [
        # Gauss-Legendre with n nodes is exact to degree 2n-1
        ("legendre-gauss", 25, 1e-12),
        # Clenshaw-Curtiss with n endpoint nodes is exact to degree n-1
        ("clenshaw-curtiss", 15, 1e-12),
        # the cell-measure rules are only O(1/n^2) accurate
        ("weatherbench2", 6, 2e-3),
        ("naive", 6, 6e-2),
    ],
)
def test_polynomial_exactness_in_costheta(rule, degree, tol):
    """Integrate cos^k(theta) over the sphere: exact value 4 pi / (k+1) for
    even k, 0 for odd k."""
    nlat, nlon = 16, 7
    w = quadrature_weights(rule, (nlat, nlon))
    x = _nodes_costheta(rule, nlat)
    for k in range(degree + 1):
        integrand = np.tile((x**k)[:, None], (1, nlon))
        got = (w * integrand).sum()
        want = 4.0 * np.pi / (k + 1.0) if k % 2 == 0 else 0.0
        assert abs(got - want) < tol * 4 * np.pi, (rule, k, got, want)


def test_grid_to_quadrature_rule_map():
    assert grid_to_quadrature_rule("equiangular") == "naive"
    assert grid_to_quadrature_rule("legendre-gauss") == "legendre-gauss"
    with pytest.raises(NotImplementedError):
        grid_to_quadrature_rule("cubed-sphere")


def test_latitude_nodes_match_weight_layout():
    """precompute_latitudes orders nodes north-to-south for every grid, in
    the same layout the weight maps use."""
    for grid in ("equiangular", "legendre-gauss", "clenshaw-curtiss"):
        theta, _ = precompute_latitudes(18, grid=grid)
        assert np.all(np.diff(theta) > 0)  # colatitude increasing = N to S
        assert theta.min() >= 0.0 and theta.max() <= np.pi


@pytest.mark.parametrize("rule", ["naive", "legendre-gauss"])
def test_crop_partition_identity(rule):
    """Summing per-tile cropped quadratures over a 2x2 tiling equals the full
    integral — the invariant spatial model parallelism relies on."""
    H, W = 12, 16
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 2, H, W)).astype(np.float32)
    full = GridQuadrature(rule, (H, W), normalize=True)
    want = np.asarray(full(jnp.asarray(x)))
    got = np.zeros_like(want)
    for i0 in (0, H // 2):
        for j0 in (0, W // 2):
            tile = GridQuadrature(rule, (H, W), crop_shape=(H // 2, W // 2), crop_offset=(i0, j0), normalize=True)
            got += np.asarray(tile(jnp.asarray(x[..., i0 : i0 + H // 2, j0 : j0 + W // 2])))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_padded_latitude_rows_have_zero_weight():
    """Extra (padded) rows/cols beyond the physical grid must not change the
    integral — the distributed transforms pad lat to the mesh multiple."""
    H, W = 11, 14
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, H, W)).astype(np.float32)
    quad = GridQuadrature("naive", (H, W), normalize=True)
    want = np.asarray(quad(jnp.asarray(x)))
    xpad = np.pad(x, [(0, 0), (0, 0), (0, 5), (0, 2)], constant_values=123.0)
    got = np.asarray(quad(jnp.asarray(xpad)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_channels_last_layout_agrees():
    H, W = 10, 20
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, H, W)).astype(np.float32)
    quad = GridQuadrature("clenshaw-curtiss", (H, W), normalize=True)
    a = np.asarray(quad(jnp.asarray(x)))
    b = np.asarray(quad(jnp.asarray(np.moveaxis(x, 1, -1)), channels_last=True))
    np.testing.assert_allclose(a, b, rtol=1e-6)


class TestBandLimitMask:
    H, W = 24, 48

    def test_sht_mask_is_projection(self):
        """Band-limiting twice equals once; constants and low-l content pass."""
        m = BandLimitMask((self.H, self.W), grid_type="equiangular", lmax=8, type="sht")
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 1, self.H, self.W)).astype(np.float32))
        once = np.asarray(m(x))
        twice = np.asarray(m(jnp.asarray(once)))
        np.testing.assert_allclose(twice, once, atol=1e-4)
        const = jnp.full((1, 1, self.H, self.W), 2.5, jnp.float32)
        np.testing.assert_allclose(np.asarray(m(const)), 2.5, atol=1e-4)

    def test_sht_mask_removes_high_l(self):
        from makani_tpu.ops.sht import RealSHT

        lmax = 6
        m = BandLimitMask((self.H, self.W), grid_type="equiangular", lmax=lmax, type="sht")
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((1, 1, self.H, self.W)).astype(np.float32))
        y = m(x)
        sht = RealSHT(self.H, self.W, grid="equiangular")
        c = np.asarray(sht.analysis(y))  # (1, 1, lmax_grid, mmax, 2)
        power_high = (c[:, :, lmax:] ** 2).sum()
        power_low = (c[:, :, :lmax] ** 2).sum()
        assert power_high < 1e-6 * power_low

    def test_fft_mask_zonal_cutoff(self):
        """The fft-type mask keeps fewer zonal modes near the poles than at
        the equator and preserves the zonal mean everywhere."""
        m = BandLimitMask((self.H, self.W), grid_type="equiangular", lmax=12, type="fft")
        mask = np.asarray(m.mask)
        assert mask.shape == (self.H, self.W // 2 + 1)
        np.testing.assert_allclose(mask[:, 0], 1.0)  # m=0 always kept
        eq = mask[self.H // 2].sum()
        pole = mask[1].sum()
        assert pole < eq
        rng = np.random.default_rng(5)
        x = rng.standard_normal((1, 1, self.H, self.W)).astype(np.float32)
        y = np.asarray(m(jnp.asarray(x)))
        np.testing.assert_allclose(y.mean(-1), x.mean(-1), atol=1e-5)
