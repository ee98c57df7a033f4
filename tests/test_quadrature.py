"""Quadrature rules: exactness and normalization.

Mirrors the reference's quadrature coverage (makani tests/test_grids.py):
weights sum to the interval measure, polynomial exactness per rule, and the
grid quadrature maps sum to 4 pi.
"""

import numpy as np
import pytest

from makani_tpu.ops.quadrature import (
    clenshaw_curtiss_weights,
    legendre_gauss_weights,
    lobatto_weights,
    precompute_latitudes,
)
from makani_tpu.utils.grids import GridQuadrature, quadrature_weights, grid_to_quadrature_rule


@pytest.mark.parametrize("rule", [legendre_gauss_weights, lobatto_weights, clenshaw_curtiss_weights])
@pytest.mark.parametrize("n", [8, 9, 64, 721])
def test_weights_sum_to_two(rule, n):
    _, w = rule(n, -1, 1)
    assert abs(np.sum(w) - 2.0) < 1e-12


@pytest.mark.parametrize(
    "rule,n,max_degree",
    [
        (legendre_gauss_weights, 8, 15),
        (lobatto_weights, 8, 13),
        (clenshaw_curtiss_weights, 9, 8),
    ],
)
def test_polynomial_exactness(rule, n, max_degree):
    x, w = rule(n, -1, 1)
    for k in range(max_degree + 1):
        exact = 2.0 / (k + 1) if k % 2 == 0 else 0.0
        approx = np.sum(w * x**k)
        assert abs(approx - exact) < 1e-12, f"degree {k}: {approx} vs {exact}"


@pytest.mark.parametrize("grid", ["equiangular", "legendre-gauss", "lobatto"])
def test_precompute_latitudes_ordering(grid):
    theta, w = precompute_latitudes(64, grid=grid)
    assert np.all(np.diff(theta) > 0)
    assert theta[0] < np.pi / 2 < theta[-1]
    assert abs(np.sum(w) - 2.0) < 1e-12
    if grid == "equiangular":
        assert abs(theta[0]) < 1e-14 and abs(theta[-1] - np.pi) < 1e-14


@pytest.mark.parametrize("rule", ["naive", "clenshaw-curtiss", "legendre-gauss", "weatherbench2", "uniform"])
def test_grid_quadrature_sums_to_4pi(rule):
    w = quadrature_weights(rule, (64, 128))
    assert abs(np.sum(w) - 4 * np.pi) < 1e-4


def test_grid_quadrature_integrates_constant():
    import jax.numpy as jnp

    quad = GridQuadrature("legendre-gauss", (32, 64))
    x = jnp.ones((2, 3, 32, 64))
    out = np.asarray(quad(x))
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out, 4 * np.pi, rtol=1e-5)


def test_grid_quadrature_cropped_tiles_sum_to_whole():
    import jax.numpy as jnp

    full = GridQuadrature("naive", (32, 64))
    tiles = [
        GridQuadrature("naive", (32, 64), crop_shape=(16, 32), crop_offset=(i * 16, j * 32))
        for i in range(2)
        for j in range(2)
    ]
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 64).astype(np.float32))
    whole = np.asarray(full(x))
    parts = sum(
        np.asarray(t(x[..., i * 16 : (i + 1) * 16, j * 32 : (j + 1) * 32]))
        for t, (i, j) in zip(tiles, [(0, 0), (0, 1), (1, 0), (1, 1)])
    )
    np.testing.assert_allclose(whole, parts, rtol=1e-5)


def test_grid_to_quadrature_rule():
    assert grid_to_quadrature_rule("equiangular") == "naive"
    assert grid_to_quadrature_rule("weatherbench2") == "weatherbench2"
    with pytest.raises(NotImplementedError):
        grid_to_quadrature_rule("bogus")
