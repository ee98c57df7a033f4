"""Spectral-space contraction kernels.

Complex einsums used by the spectral convolution and attention layers,
matching the semantics of the reference's contraction zoo
(``makani/models/common/contractions.py:19-151``). Complex multiplies are
expressed over an explicit trailing real/imag pair so XLA lowers them to four
real MXU matmuls instead of routing through a complex dtype (complex einsums
block some fusions on TPU); the spectral layers keep weights and activations
in this split layout around the transforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "contract_dense",
    "compl_mul2d",
    "compl_muladd2d",
    "compl_exp_mul2d",
    "compl_exp_muladd2d",
]


def _split(z):
    return z.real, z.imag


def _cmul_einsum(eq: str, a: jnp.ndarray, b: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Complex einsum via four real einsums: (ar+i ai)(br+i bi)."""
    ar, ai = _split(a)
    br, bi = _split(b)
    rr = jnp.einsum(eq, ar, br, precision=precision)
    ri = jnp.einsum(eq, ar, bi, precision=precision)
    ir = jnp.einsum(eq, ai, br, precision=precision)
    ii = jnp.einsum(eq, ai, bi, precision=precision)
    return jax.lax.complex(rr - ii, ri + ir)


def contract_dense(x: jnp.ndarray, weight: jnp.ndarray, separable: bool = False, operator_type: str = "diagonal") -> jnp.ndarray:
    """Grouped spectral contraction.

    x: (B, G, C_in/G, L, M) complex; weight layouts per operator type:
      * diagonal, dense:    (G, C_in/G, C_out/G, L, M) -> 'bgixy,gioxy->bgoxy'
      * dhconv, dense:      (G, C_in/G, C_out/G, L)    -> 'bgixy,giox->bgoxy'
      * diagonal, separable:(G, C_in/G, L, M)          -> 'bgixy,gixy->bgixy'
      * dhconv, separable:  (G, C_in/G, L)             -> 'bgixy,gix->bgixy'
    """
    if separable:
        if operator_type == "diagonal":
            eq = "bgixy,gixy->bgixy"
        elif operator_type == "dhconv":
            eq = "bgixy,gix->bgixy"
        else:
            raise ValueError(f"Unknown operator type {operator_type}")
    else:
        if operator_type == "diagonal":
            eq = "bgixy,gioxy->bgoxy"
        elif operator_type == "dhconv":
            eq = "bgixy,giox->bgoxy"
        else:
            raise ValueError(f"Unknown operator type {operator_type}")
    return _cmul_einsum(eq, x, weight)


def compl_mul2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Channel mixing shared across modes: (B,C_in,L,M) x (C_in,C_out)."""
    return _cmul_einsum("bixy,io->boxy", x, w)


def compl_muladd2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return compl_mul2d(x, w) + b


def compl_exp_mul2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Per-degree channel mixing: (B,C_in,L,M) x (L,C_in,C_out)."""
    return _cmul_einsum("bixy,xio->boxy", x, w)


def compl_exp_muladd2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return compl_exp_mul2d(x, w) + b
