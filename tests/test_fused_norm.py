"""Parity tests for the fused instance-norm primitive (ops/norm.py).

The custom VJP must match JAX autodiff of the unfused two-pass formulation
exactly (same fp32 arithmetic, reassociated): values and all grads, for the
uniform, padded-latitude-masked, and quadrature-weighted variants, both
layouts. Mirrors the reference's norm semantics
(makani/models/common/layer_norm.py:30-153, mpu/layer_norm.py:108-253).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from makani_tpu.ops.norm import weighted_instance_norm_affine


def unfused(x, w, b, q, channels_last, eps):
    sp = (-3, -2) if channels_last else (-2, -1)
    xs = x.astype(jnp.float32)
    qe = q[..., None] if channels_last else q
    mean = jnp.sum(xs * qe, axis=sp, keepdims=True)
    var = jnp.sum(jnp.square(xs - mean) * qe, axis=sp, keepdims=True)
    y = (xs - mean) * jax.lax.rsqrt(var + eps)
    we = w if channels_last else w[:, None, None]
    be = b if channels_last else b[:, None, None]
    return (y * we + be).astype(x.dtype)


def _q_for(variant, H, W):
    if variant == "uniform":
        return jnp.full((1, 1), 1.0 / (H * W), jnp.float32)
    if variant == "masked":
        nphys = H - 3
        return jnp.asarray((np.arange(H) < nphys).astype(np.float32)[:, None] / (nphys * W))
    # quadrature: sin(theta)-weighted rows, normalized
    th = np.pi * (np.arange(H) + 0.5) / H
    qlat = np.sin(th)
    q = np.repeat((qlat / qlat.sum() / W)[:, None], W, axis=1)
    return jnp.asarray(q.astype(np.float32))


@pytest.mark.parametrize("variant", ["uniform", "masked", "quadrature"])
@pytest.mark.parametrize("channels_last", [False, True])
def test_fused_norm_value_and_grads(variant, channels_last):
    B, C, H, W = 2, 5, 12, 17
    rng = np.random.RandomState(42)
    shape = (B, H, W, C) if channels_last else (B, C, H, W)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32)) * 3.0 + 1.5
    w = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(C).astype(np.float32))
    q = _q_for(variant, H, W)
    eps = 1e-6

    y_f = weighted_instance_norm_affine(x, w, b, q, channels_last, eps)
    y_u = unfused(x, w, b, q, channels_last, eps)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u), rtol=2e-6, atol=2e-6)

    cot = jnp.asarray(rng.randn(*shape).astype(np.float32))

    def loss_f(x, w, b):
        return jnp.sum(weighted_instance_norm_affine(x, w, b, q, channels_last, eps) * cot)

    def loss_u(x, w, b):
        return jnp.sum(unfused(x, w, b, q, channels_last, eps) * cot)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, w, b)
    gu = jax.grad(loss_u, argnums=(0, 1, 2))(x, w, b)
    for a, e, name in zip(gf, gu, ["dx", "dw", "db"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=3e-5, atol=3e-5, err_msg=name)


def test_fused_norm_padded_rows_get_elementwise_grad():
    """Zero-weight (padded) rows must receive dx = rsig * w * g exactly."""
    B, C, H, W = 1, 3, 8, 6
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    w = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    b = jnp.zeros((C,), jnp.float32)
    nphys = 5
    q = jnp.asarray((np.arange(H) < nphys).astype(np.float32)[:, None] / (nphys * W))
    cot = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))

    dx = jax.grad(lambda x: jnp.sum(weighted_instance_norm_affine(x, w, b, q, False, 1e-6) * cot))(x)

    xs = np.asarray(x)
    mask = (np.arange(H) < nphys)[None, None, :, None]
    mean = (xs * mask).sum(axis=(-2, -1), keepdims=True) / (nphys * W)
    var = (np.square(xs - mean) * mask).sum(axis=(-2, -1), keepdims=True) / (nphys * W)
    rsig = 1.0 / np.sqrt(var + 1e-6)
    expected_pad = rsig * np.asarray(w)[None, :, None, None] * np.asarray(cot)
    np.testing.assert_allclose(np.asarray(dx)[..., nphys:, :], expected_pad[..., nphys:, :], rtol=1e-5, atol=1e-6)


def test_fused_norm_bf16_io():
    B, C, H, W = 2, 4, 9, 10
    rng = np.random.RandomState(1)
    x32 = rng.randn(B, H, W, C).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    w = jnp.ones((C,), jnp.float32)
    b = jnp.zeros((C,), jnp.float32)
    q = jnp.full((1, 1), 1.0 / (H * W), jnp.float32)
    y = weighted_instance_norm_affine(x, w, b, q, True, 1e-6)
    assert y.dtype == jnp.bfloat16
    y_ref = unfused(jnp.asarray(x32), w, b, q, True, 1e-6)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(y_ref), rtol=0.05, atol=0.05)
