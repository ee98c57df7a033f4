"""Spherical bilinear resampling (torch-harmonics ResampleS2 parity
surface; bound by FCN3's encoder/decoder grid moves). Checks interpolation
exactness classes (constants, fields linear in colatitude, periodic
longitude lerp), identity on matching grids, grid-type conversions, and
smooth-field round-trip accuracy.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.ops.quadrature import precompute_latitudes
from makani_tpu.ops.resample import ResampleS2


def test_identity_on_same_grid():
    r = ResampleS2(16, 32, 16, 32)
    x = np.random.default_rng(0).standard_normal((2, 3, 16, 32)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(r(jnp.asarray(x))), x, atol=1e-6)


def test_constant_preserved_any_grids():
    for gi, go in [("equiangular", "equiangular"), ("equiangular", "legendre-gauss"), ("legendre-gauss", "equiangular")]:
        r = ResampleS2(14, 28, 27, 54, grid_in=gi, grid_out=go)
        x = jnp.full((1, 1, 14, 28), 3.25, jnp.float32)
        np.testing.assert_allclose(np.asarray(r(x)), 3.25, atol=1e-6)


def test_linear_in_colatitude_exact_interior():
    """Bilinear interpolation reproduces fields linear in theta exactly on
    interior output latitudes (clipping only affects extrapolated poles)."""
    nlat_in, nlat_out = 20, 37
    ti, _ = precompute_latitudes(nlat_in, grid="equiangular")
    to, _ = precompute_latitudes(nlat_out, grid="equiangular")
    x = np.broadcast_to(ti[:, None], (nlat_in, 8)).astype(np.float32)[None]
    r = ResampleS2(nlat_in, 8, nlat_out, 8)
    y = np.asarray(r(jnp.asarray(x)))[0]
    interior = (to >= ti[0]) & (to <= ti[-1])
    np.testing.assert_allclose(y[interior], np.broadcast_to(to[interior, None], (interior.sum(), 8)), atol=1e-5)
    # extrapolated rows are clipped to the boundary value, not extrapolated
    assert np.all(y[~interior] >= ti[0] - 1e-6) and np.all(y[~interior] <= ti[-1] + 1e-6)


def test_longitude_lerp_periodic_and_exact_on_multiples():
    """Upsampling longitude by an integer factor keeps the original columns
    exactly and wraps periodically at the seam."""
    nlon_in, factor = 12, 3
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1, 6, nlon_in)).astype(np.float32)
    r = ResampleS2(6, nlon_in, 6, nlon_in * factor)
    y = np.asarray(r(jnp.asarray(x)))
    np.testing.assert_allclose(y[..., ::factor], x, atol=1e-6)
    # the column between the last and first input columns lerps across the seam
    w = 1.0 / factor
    want = x[..., -1] * (1 - w) + x[..., 0] * w
    np.testing.assert_allclose(y[..., -factor + 1], want, atol=1e-6)


def test_smooth_field_round_trip():
    """Down-then-up on a band-limited field stays within interpolation error."""
    H, W = 64, 128
    theta, _ = precompute_latitudes(H, grid="equiangular")
    phi = np.arange(W) * (2 * np.pi / W)
    f = (np.sin(theta)[:, None] * np.cos(2 * phi)[None, :] + np.cos(theta)[:, None]).astype(np.float32)[None, None]
    down = ResampleS2(H, W, H // 2, W // 2)
    up = ResampleS2(H // 2, W // 2, H, W)
    g = np.asarray(up(down(jnp.asarray(f))))
    # interior error is O(h^2); exclude the two clipped polar rows
    assert np.abs((g - f)[..., 2:-2, :]).max() < 0.01


def test_gauss_grid_conversion_accuracy():
    """equiangular -> legendre-gauss -> equiangular on a smooth zonal field."""
    H, W = 48, 96
    theta, _ = precompute_latitudes(H, grid="equiangular")
    f = np.cos(2 * theta).astype(np.float32)[None, :, None] * np.ones((1, H, W), np.float32)
    to_lg = ResampleS2(H, W, H, W, grid_in="equiangular", grid_out="legendre-gauss")
    back = ResampleS2(H, W, H, W, grid_in="legendre-gauss", grid_out="equiangular")
    g = np.asarray(back(to_lg(jnp.asarray(f))))
    assert np.abs((g - f)[:, 2:-2]).max() < 0.01


def test_dtype_and_shape_preserved():
    r = ResampleS2(10, 20, 15, 30)
    x = jnp.zeros((2, 5, 10, 20), jnp.bfloat16)
    y = r(x)
    assert y.shape == (2, 5, 15, 30)
    assert y.dtype == jnp.bfloat16


def test_unsupported_mode_raises():
    with pytest.raises(NotImplementedError):
        ResampleS2(8, 16, 8, 16, mode="bicubic")


def test_matmul_method_matches_gather():
    """The banded-matrix formulation is the same arithmetic as the gather
    lerps (used under SPMD where gathers force input all-gathers)."""
    rng = np.random.default_rng(2)
    for (hi, wi, ho, wo, gi, go) in [
        (16, 32, 31, 64, "equiangular", "equiangular"),
        (18, 36, 12, 24, "equiangular", "legendre-gauss"),
        (14, 28, 14, 28, "legendre-gauss", "equiangular"),
    ]:
        rg = ResampleS2(hi, wi, ho, wo, grid_in=gi, grid_out=go, method="gather")
        rm = ResampleS2(hi, wi, ho, wo, grid_in=gi, grid_out=go, method="matmul")
        x = jnp.asarray(rng.standard_normal((2, 3, hi, wi)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(rm(x)), np.asarray(rg(x)), atol=2e-5)


def test_auto_method_picks_matmul_under_spatial_mesh():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from makani_tpu.parallel import mesh as pmesh

    r = ResampleS2(16, 32, 32, 64, method="auto")
    x = np.random.default_rng(4).standard_normal((2, 3, 16, 32)).astype(np.float32)
    serial = np.asarray(r(jnp.asarray(x)))
    pmesh.cleanup()
    mesh = pmesh.init(h=2, w=2, batch=2)
    try:
        xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("batch", None, "h", "w")))
        out = jax.jit(r)(xd)
        np.testing.assert_allclose(np.asarray(out), serial, atol=2e-5)
        # under the spatial mesh the compiled resample must not all-gather
        # the field: the matmul formulation keeps communication to reduce
        # patterns (this is the DistributedResampleS2 role, ref
        # fourcastnet3.py:356-358)
        hlo = jax.jit(r).lower(xd).compile().as_text()
        for line in hlo.splitlines():
            if "all-gather" in line and "f32[2,3,16,32]" in line:
                raise AssertionError(f"full-field all-gather in resample HLO: {line}")
    finally:
        pmesh.cleanup()


def _dist_parity_case(hi, wi, ho, wo, gi="equiangular", go="equiangular", h=2, w=2):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from makani_tpu.parallel import mesh as pmesh
    from makani_tpu.parallel.resample import DistributedResampleS2

    serial = ResampleS2(hi, wi, ho, wo, grid_in=gi, grid_out=go)
    x = np.random.default_rng(7).standard_normal((2, 3, hi, wi)).astype(np.float32)
    want = np.asarray(serial(jnp.asarray(x)))
    pmesh.cleanup()
    mesh = pmesh.init(h=h, w=w, batch=8 // (h * w))
    try:
        dist = DistributedResampleS2(hi, wi, ho, wo, grid_in=gi, grid_out=go)
        # device_put needs divisible dims; the op pads odd lat itself when
        # called inside jit, so hand it the padded field here
        xp = np.pad(x, [(0, 0), (0, 0), (0, dist.Hin_pad - hi), (0, 0)])
        xd = jax.device_put(jnp.asarray(xp), NamedSharding(mesh, P("batch", None, "h", "w")))
        got = np.asarray(jax.jit(dist)(xd))
        np.testing.assert_allclose(got, want, atol=2e-5)
        return jax.jit(dist).lower(xd).compile().as_text()
    finally:
        pmesh.cleanup()


def test_distributed_resample_parity_upsample():
    """FCN3 decoder shapes: internal grid up to the data grid (odd Hin)."""
    _dist_parity_case(19, 36, 37, 72)


def test_distributed_resample_parity_downsample_and_grids():
    _dist_parity_case(37, 72, 19, 36)
    _dist_parity_case(24, 48, 24, 48, gi="equiangular", go="legendre-gauss")


def test_distributed_resample_h4():
    _dist_parity_case(21, 40, 42, 80, h=4, w=2)


def test_distributed_resample_collectives_are_halo_only():
    """The shard_map computation must communicate via neighbor
    collective-permutes only — no all-gather of the field (the GSPMD
    gather/matmul failure mode this op exists to fix; PERF.md round-4
    census). Compiled without the final unpad slice, as in the model where
    the downstream DISCO conv consumes the padded rows."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from makani_tpu.parallel import mesh as pmesh
    from makani_tpu.parallel.resample import DistributedResampleS2

    pmesh.cleanup()
    mesh = pmesh.init(h=2, w=2, batch=2)
    try:
        dist = DistributedResampleS2(19, 36, 37, 72)
        x = jnp.zeros((2, 3, dist.Hin_pad, 36), jnp.float32)
        xd = jax.device_put(x, NamedSharding(mesh, P("batch", None, "h", "w")))
        hlo = jax.jit(dist._fn).lower(xd).compile().as_text()
        assert "all-gather(" not in hlo, "distributed resample emitted an all-gather"
        assert "collective-permute" in hlo
    finally:
        pmesh.cleanup()
