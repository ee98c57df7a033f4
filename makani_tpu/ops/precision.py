"""Transform precision policy.

The SHT/DFT contractions are long accumulations; their MXU precision is the
single biggest performance knob on TPU:

  * HIGHEST — 6 bf16 passes per fp32 multiply (exact fp32; parity testing),
  * HIGH    — 3 passes (~TF32 fidelity: what the reference's A100 cuBLAS
              TF32 path computes in practice),
  * DEFAULT — 1 bf16 pass (fastest; fine for bf16-trained models).

Selected via env ``MAKANI_TRANSFORM_PRECISION`` in {highest, high, default}
(default: highest) or ``set_transform_precision``.
"""

from __future__ import annotations

import os

import jax

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

_current = os.environ.get("MAKANI_TRANSFORM_PRECISION", "highest").lower()


def set_transform_precision(name: str):
    global _current
    if name.lower() not in _PRECISIONS:
        raise ValueError(f"unknown precision {name}; options: {list(_PRECISIONS)}")
    _current = name.lower()


def transform_precision():
    return _PRECISIONS[_current]


def transform_io_dtype():
    """Dtype the model should feed the spectral transforms.

    In DEFAULT (single-bf16-pass) mode the MXU rounds every operand to bf16
    anyway, so upcasting activations to fp32 around the transforms only
    doubles the HBM traffic of the full-resolution stages — keep them bf16.
    HIGH/HIGHEST genuinely consume fp32 operands (multi-pass splitting), so
    the upcast stays."""
    import jax.numpy as jnp

    return jnp.bfloat16 if _current == "default" else jnp.float32


def maybe_cast_table(table, x):
    """Cast an fp32 transform table to the activation dtype for bf16 inputs,
    so table einsums stay bf16-in/bf16-out instead of promoting everything to
    fp32 (pure traffic: in DEFAULT mode the MXU rounds operands to bf16
    regardless, and accumulation is fp32 either way)."""
    import jax.numpy as jnp

    if x.dtype == jnp.bfloat16:
        return jnp.asarray(table, jnp.bfloat16)
    return jnp.asarray(table)
