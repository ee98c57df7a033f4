"""fp8 quantized matmul path (ref utils/precision.py:109-167 TE recipe).

Numerics: quantize/dequantize round trip within fp8 resolution, fp8 einsum
approximates the bf16 one, the Conv1x1 path flips on via MAKANI_FP8, and the
whole thing differentiates (straight-through the descale)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.ops.fp8 import FP8_MAX, fp8_einsum, quantize, set_fp8


@pytest.fixture(autouse=True)
def _clear_env():
    yield
    os.environ.pop("MAKANI_FP8", None)


def test_quantize_round_trip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 64).astype(np.float32) * 3.0)
    xq, scale = quantize(x)
    assert xq.dtype == jnp.float8_e4m3fn
    back = xq.astype(jnp.float32) * scale
    # e4m3 has ~2 decimal digits of mantissa; relative error bounded by ~6%
    err = float(jnp.max(jnp.abs(back - x)) / jnp.max(jnp.abs(x)))
    assert err < 0.07
    # full range used
    assert float(jnp.max(jnp.abs(xq.astype(jnp.float32)))) > 0.9 * FP8_MAX


def test_fp8_einsum_close_to_bf16():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(32, 48).astype(np.float32))
    b = jnp.asarray(rng.randn(48, 16).astype(np.float32))
    ref = jnp.einsum("ik,ko->io", a, b)
    out = fp8_einsum("ik,ko->io", a, b, out_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05


def test_conv1x1_fp8_path_activates():
    from makani_tpu.models.common.layers import Conv1x1

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 4, 6).astype(np.float32))
    layer = Conv1x1(16, dtype=jnp.bfloat16)
    p = layer.init(jax.random.PRNGKey(0), x)

    ref = np.asarray(layer.apply(p, x), np.float32)
    os.environ["MAKANI_FP8"] = "1"
    out = np.asarray(layer.apply(p, x), np.float32)
    assert out.dtype == np.float32 and out.shape == ref.shape
    # quantized but close
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert 0 < rel < 0.1

    # differentiable
    g = jax.grad(lambda q: jnp.mean(layer.apply(q, x).astype(jnp.float32) ** 2))(p)
    gmax = max(float(jnp.abs(le).max()) for le in jax.tree.leaves(g))
    assert np.isfinite(gmax)


def test_fp8_config_driven():
    """compute_dtype: "fp8" in the recipe flips the path on via the registry
    (no env var), and the env var still overrides for ablations."""
    from makani_tpu.ops import fp8 as fp8mod

    assert not fp8mod.fp8_enabled()
    set_fp8(True)
    try:
        assert fp8mod.fp8_enabled()
        os.environ["MAKANI_FP8"] = "0"
        assert not fp8mod.fp8_enabled()  # env override wins
    finally:
        set_fp8(False)
        os.environ.pop("MAKANI_FP8", None)
    assert not fp8mod.fp8_enabled()


def test_fp8_via_model_registry_compute_dtype():
    from makani_tpu.models.model_registry import get_model
    from makani_tpu.ops import fp8 as fp8mod
    from makani_tpu.utils.yparams import ParamsBase

    params = ParamsBase(
        dict(
            nettype="DebugNet",
            img_shape_x=8,
            img_shape_y=16,
            channel_names=["a", "b"],
            in_channels=[0, 1],
            out_channels=[0, 1],
            n_history=0,
            n_future=0,
            add_zenith=False,
            compute_dtype="fp8",
        )
    )
    try:
        get_model(params, multistep=False)
        assert fp8mod.fp8_enabled()
    finally:
        set_fp8(False)
