"""fp8 quantized matmul path (ref makani/utils/precision.py:109-167 and
te_helpers.py — the TransformerEngine fp8-recipe equivalent).

TransformerEngine's delayed-scaling recipe keeps a per-tensor amax history,
derives a scale so values fill the fp8 dynamic range, stores/multiplies in
fp8 and accumulates in higher precision. The TPU-native equivalent below is
functional (jit-pure) rather than module-stateful:

  * ``quantize(x)``    -> (x_fp8, scale): per-tensor symmetric scaling into
    float8_e4m3fn (the forward dtype of TE's HYBRID recipe),
  * ``fp8_dot(a, b)``  -> dot_general on the fp8 operands with a
    ``preferred_element_type`` of fp32, descaled by the product of scales,
  * ``fp8_einsum``     -> the einsum form used by the pointwise layers.

On TPU generations with native fp8 MXU support (v6e+/Trillium) XLA lowers
these dots to fp8 hardware paths; on earlier chips (v5e/v5p) XLA emulates via
upcast — numerics identical, no speedup — so the path is opt-in:
``MAKANI_FP8=1`` or ``compute_dtype: "fp8"``. Like the reference (fp8 amax
reduced over the data group only, precision.py:122-128), scales are
per-tensor and replicated; they never interact with tensor-parallel sharding.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["fp8_enabled", "set_fp8", "quantize", "dequantize_scale", "fp8_dot", "fp8_einsum", "FP8_MAX"]

# float8_e4m3fn: max finite value 448 (no inf; NaN only)
FP8_MAX = 448.0
_FP8_DTYPE = jnp.float8_e4m3fn

# config-driven switch (compute_dtype: "fp8" in the recipe YAML flips it via
# model_registry); the env var remains as an override for ablations
_FP8_ON = False


def set_fp8(on: bool):
    global _FP8_ON
    _FP8_ON = bool(on)


def fp8_enabled() -> bool:
    env = os.environ.get("MAKANI_FP8", None)
    if env is not None:
        return env in ("1", "true", "on")
    return _FP8_ON


def quantize(x: jnp.ndarray, amax: jnp.ndarray | None = None):
    """Symmetric per-tensor quantization to float8_e4m3fn.

    ``amax``: optional externally tracked absolute maximum (delayed scaling);
    defaults to the tensor's own amax (just-in-time scaling). Returns
    (x_fp8, scale) with x ~= x_fp8.astype(f32) * scale.
    """
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf)) if amax is None else amax.astype(jnp.float32)
    scale = jnp.maximum(a, 1e-12) / FP8_MAX
    xq = jnp.clip(xf / scale, -FP8_MAX, FP8_MAX).astype(_FP8_DTYPE)
    return xq, scale


def dequantize_scale(scale_a: jnp.ndarray, scale_b: jnp.ndarray) -> jnp.ndarray:
    return scale_a * scale_b


def fp8_dot(a: jnp.ndarray, b: jnp.ndarray, dimension_numbers, amax_a=None, amax_b=None, out_dtype=jnp.bfloat16):
    """dot_general with fp8 operands and fp32 accumulation."""
    aq, sa = quantize(a, amax_a)
    bq, sb = quantize(b, amax_b)
    out = jax.lax.dot_general(aq, bq, dimension_numbers, preferred_element_type=jnp.float32)
    return (out * dequantize_scale(sa, sb)).astype(out_dtype)


def fp8_einsum(eq: str, a: jnp.ndarray, b: jnp.ndarray, amax_a=None, amax_b=None, out_dtype=jnp.bfloat16):
    """einsum on fp8-quantized operands, fp32 accumulation, descaled output."""
    aq, sa = quantize(a, amax_a)
    bq, sb = quantize(b, amax_b)
    out = jnp.einsum(eq, aq, bq, preferred_element_type=jnp.float32)
    return (out * dequantize_scale(sa, sb)).astype(out_dtype)


# NOTE: TE's *delayed* scaling (a running amax history across steps) exists on
# GPU because computing the amax inline costs an extra kernel launch before
# every GEMM. On TPU, XLA fuses the abs-max reduction into the quantize, so
# just-in-time per-tensor scaling (the default of quantize()) is free and
# strictly more accurate — there is deliberately no amax-history state here.
