"""DISCO convolution: fast structured path vs brute-force dense reference.

The brute-force reference evaluates psi_k(p_out, p_in) for every point pair
directly from the same basis definition and contracts densely — the
structured path (grouped convs + FFT polar rows + phase decomposition) must
match it exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.ops.disco import DiscoConvS2, _basis_values, compute_cutoff_radius, num_basis_functions
from makani_tpu.ops.quadrature import precompute_latitudes


def brute_force_disco(x, in_shape, out_shape, kernel_shape, theta_cutoff, basis_norm_mode="none"):
    """Dense reference: t[b,c,k,ho,wo] = sum_{hi,wi} psi_k(out, in) q(in) x[b,c,hi,wi]."""
    nlat_in, nlon_in = in_shape
    nlat_out, nlon_out = out_shape
    theta_in, wq = precompute_latitudes(nlat_in, grid="equiangular")
    theta_out, _ = precompute_latitudes(nlat_out, grid="equiangular")
    dphi_in = 2 * np.pi / nlon_in
    quad = wq * dphi_in
    phi_in = np.arange(nlon_in) * dphi_in
    phi_out = np.arange(nlon_out) * 2 * np.pi / nlon_out

    K = num_basis_functions(kernel_shape)
    B, C = x.shape[:2]
    t = np.zeros((B, C, K, nlat_out, nlon_out), np.float64)
    for ho in range(nlat_out):
        for wo in range(nlon_out):
            to, po = theta_out[ho], phi_out[wo]
            ti = theta_in[:, None]
            ph = phi_in[None, :] - po
            cosr = np.cos(to) * np.cos(ti) + np.sin(to) * np.sin(ti) * np.cos(ph)
            r = np.arccos(np.clip(cosr, -1, 1))
            alpha = np.arctan2(
                np.sin(ph) * np.sin(ti), np.cos(ti) * np.sin(to) - np.sin(ti) * np.cos(to) * np.cos(ph)
            )
            psi = _basis_values(r, alpha, kernel_shape, theta_cutoff)  # (K, Hin, Win)
            psi = np.where(r[None] <= theta_cutoff, psi, 0.0) * quad[None, :, None]
            t[:, :, :, ho, wo] = np.einsum("khw,bchw->bck", psi, x)
    return t


@pytest.mark.parametrize(
    "in_shape,out_shape,kernel_shape",
    [
        ((16, 32), (16, 32), (2, 1)),
        ((16, 32), (16, 32), (3, 4)),
        ((17, 36), (12, 24), (3, 4)),  # downsampling with phase decomposition (36/24 = 3/2)
        ((12, 24), (17, 36), (2, 3)),  # upsampling
    ],
)
def test_disco_matches_brute_force(in_shape, out_shape, kernel_shape):
    theta_cutoff = compute_cutoff_radius(in_shape[0], kernel_shape, "piecewise linear")
    conv = DiscoConvS2(in_shape, out_shape, kernel_shape, basis_norm_mode="none", theta_cutoff=theta_cutoff)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, *in_shape).astype(np.float32)

    fast = np.asarray(conv(jnp.asarray(x)))
    ref = brute_force_disco(x, in_shape, out_shape, kernel_shape, theta_cutoff)

    assert fast.shape == ref.shape
    np.testing.assert_allclose(fast, ref, atol=2e-4, rtol=1e-3)


def test_disco_lon_equivariance():
    """Rolling the input in longitude rolls the output (same nlon)."""
    in_shape = (16, 32)
    conv = DiscoConvS2(in_shape, in_shape, (3, 4))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, *in_shape).astype(np.float32)
    t0 = np.asarray(conv(jnp.asarray(x)))
    t1 = np.asarray(conv(jnp.asarray(np.roll(x, 5, axis=-1))))
    np.testing.assert_allclose(np.roll(t0, 5, axis=-1), t1, atol=1e-4)


def test_disco_constant_field_isotropy():
    """On a constant field the anisotropic basis responses integrate to ~0
    along the azimuthal sin/cos directions away from the poles."""
    in_shape = (24, 48)
    ks = (3, 4)
    conv = DiscoConvS2(in_shape, in_shape, ks, basis_norm_mode="mean")
    x = np.ones((1, 1, *in_shape), np.float32)
    t = np.asarray(conv(jnp.asarray(x)))  # (1,1,K,H,W)
    # center (isotropic) response is positive everywhere
    assert (t[0, 0, 0] > 0).all()
    # the pure sin-azimuth bases (k = 3 for p=2 with our ordering) nearly
    # cancel on a constant field at mid-latitudes
    mid = in_shape[0] // 2
    assert np.abs(t[0, 0, 3, mid]).max() < np.abs(t[0, 0, 0, mid]).max() * 0.2


@pytest.mark.parametrize("variant", ["window", "taps", "dense", "dense_tile4", "dense_tile64"])
@pytest.mark.parametrize("channels", [(3, 2, 4), (2, 1, 8)])
@pytest.mark.parametrize("shapes", [((16, 32), (16, 32)), ((17, 36), (12, 24)), ((24, 48), (24, 48))])
def test_fused_weight_path_matches_two_stage(shapes, channels, variant, monkeypatch):
    """DiscoConvS2.fused (weights pre-contracted into the conv filters) must
    reproduce the two-stage responses-then-mix path, values and grads —
    for every formulation (MAKANI_DISCO_FUSED=window|taps|dense, and the
    per-band blocked dense tiling MAKANI_DISCO_DENSE_TILE — tile 4 exercises
    many ragged tiles, tile 64 a single covering tile). The two channel
    configs pick the two polar-FFT contraction orders (og*BL vs ig):
    (3,2,4) runs psi-first (encoder-like), (2,1,8) mix-first (decoder-like)."""
    if variant.startswith("dense_tile"):
        monkeypatch.setenv("MAKANI_DISCO_DENSE_TILE", variant[len("dense_tile"):])
        variant = "dense"
    monkeypatch.setenv("MAKANI_DISCO_FUSED", variant)
    in_shape, out_shape = shapes
    kernel_shape = (3, 3)
    conv = DiscoConvS2(in_shape, out_shape, kernel_shape, basis_type="morlet th", basis_norm_mode="mean")
    K = conv.K
    g, og, ig = channels
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, g * ig, *in_shape).astype(np.float32))
    w = jnp.asarray(rng.randn(g, og, ig, K).astype(np.float32) * 0.2)

    def two_stage(x_, w_):
        t = conv(x_)  # (B, C, K, Hout, Wout)
        tg = t.reshape(t.shape[0], g, ig, K, *t.shape[-2:])
        return jnp.einsum("bgikhw,goik->bgohw", tg, w_).reshape(t.shape[0], g * og, *t.shape[-2:])

    import jax

    y0 = np.asarray(two_stage(x, w), np.float64)
    y1 = np.asarray(conv.fused(x, w), np.float64)
    scale = np.abs(y0).max()
    np.testing.assert_allclose(y1, y0, atol=3e-5 * scale, rtol=1e-4)

    # gradients through both paths agree (w and x)
    g0w = jax.grad(lambda ww: jnp.sum(jnp.sin(two_stage(x, ww))))(w)
    g1w = jax.grad(lambda ww: jnp.sum(jnp.sin(conv.fused(x, ww))))(w)
    np.testing.assert_allclose(np.asarray(g1w), np.asarray(g0w), atol=5e-4 * float(jnp.abs(g0w).max()))
    g0x = jax.grad(lambda xx: jnp.sum(jnp.sin(two_stage(xx, w))))(x)
    g1x = jax.grad(lambda xx: jnp.sum(jnp.sin(conv.fused(xx, w))))(x)
    np.testing.assert_allclose(np.asarray(g1x), np.asarray(g0x), atol=5e-4 * float(jnp.abs(g0x).max()))


@pytest.mark.parametrize("shapes", [((16, 32), (16, 32)), ((17, 36), (12, 24)), ((24, 48), (24, 48))])
def test_mix_first_path_matches_two_stage(shapes):
    """DiscoConvS2.mix_first (channel mixing before the basis convs, scanned
    over k) must reproduce the two-stage path, values and grads — including
    the polar FFT rows and multi-phase downsampling."""
    import jax

    in_shape, out_shape = shapes
    conv = DiscoConvS2(in_shape, out_shape, (3, 3), basis_type="morlet th", basis_norm_mode="mean")
    K = conv.K
    g, og, ig = 2, 3, 4
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, g * ig, *in_shape).astype(np.float32))
    w = jnp.asarray(rng.randn(g, og, ig, K).astype(np.float32) * 0.2)

    def two_stage(x_, w_):
        t = conv(x_)
        tg = t.reshape(t.shape[0], g, ig, K, *t.shape[-2:])
        return jnp.einsum("bgikhw,goik->bgohw", tg, w_).reshape(t.shape[0], g * og, *t.shape[-2:])

    y0 = np.asarray(two_stage(x, w), np.float64)
    y1 = np.asarray(conv.mix_first(x, w), np.float64)
    scale = np.abs(y0).max()
    np.testing.assert_allclose(y1, y0, atol=3e-5 * scale, rtol=1e-4)

    g0w = jax.grad(lambda ww: jnp.sum(jnp.sin(two_stage(x, ww))))(w)
    g1w = jax.grad(lambda ww: jnp.sum(jnp.sin(conv.mix_first(x, ww))))(w)
    np.testing.assert_allclose(np.asarray(g1w), np.asarray(g0w), atol=5e-4 * float(jnp.abs(g0w).max()))
    g0x = jax.grad(lambda xx: jnp.sum(jnp.sin(two_stage(xx, w))))(x)
    g1x = jax.grad(lambda xx: jnp.sum(jnp.sin(conv.mix_first(xx, w))))(x)
    np.testing.assert_allclose(np.asarray(g1x), np.asarray(g0x), atol=5e-4 * float(jnp.abs(g0x).max()))


def test_mix_first_scan_saves_no_per_k_fields():
    """The scan VJP must not stash per-iteration (B, C, H, W) mixed fields:
    psi is constant, so residuals are x and the (g, og, ig) weight slices.
    Guard by inspecting the backward jaxpr for K-leading intermediates."""
    conv = DiscoConvS2((16, 32), (16, 32), (3, 3), basis_type="piecewise linear", basis_norm_mode="mean")
    K = conv.K
    g, og, ig = 1, 6, 6
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, g * ig, 16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(g, og, ig, K).astype(np.float32) * 0.2)

    import jax

    fn = lambda xx, ww: jnp.sum(jnp.square(conv.mix_first(xx, ww)))
    jaxpr = jax.make_jaxpr(lambda xx, ww: jax.grad(fn, argnums=(0, 1))(xx, ww))(x, w)
    # stacked per-k activations would appear as (K, B, C, H, W) = (K, 1, 6, 16, 32)
    big = [v for eqn in jaxpr.jaxpr.eqns for v in eqn.outvars if hasattr(v, "aval") and v.aval.shape[:1] == (K,) and len(v.aval.shape) == 5 and v.aval.shape[1:] == (1, 6, 16, 32)]
    assert not big, f"scan saved per-k field residuals: {[v.aval.shape for v in big]}"
