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
