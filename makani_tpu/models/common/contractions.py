"""Spectral-space contraction kernels (split-complex).

Complex einsums used by the spectral convolution and attention layers,
matching the semantics of the reference's contraction zoo
(``makani/models/common/contractions.py:19-151``). All complex values are
carried as real arrays with a trailing [re, im] axis — no complex dtype ever
reaches the device (the axon TPU backend implements no complex ops), and the
four real einsums of each complex multiply map straight onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "cmul_einsum_s",
    "contract_dense_s",
    "compl_mul2d_s",
    "compl_muladd2d_s",
    "compl_exp_mul2d_s",
    "compl_exp_muladd2d_s",
]


def cmul_einsum_s(eq: str, a2: jnp.ndarray, b2: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Complex einsum on split arrays: (ar + i ai)(br + i bi) via 4 real einsums.

    ``eq`` is the einsum over the logical (pair-less) axes.
    """
    # keep bf16 activations bf16 through the contraction: fp32 weights would
    # promote the whole spectral tensor to fp32 (pure HBM traffic; the MXU
    # rounds operands per the precision policy anyway)
    if a2.dtype == jnp.bfloat16 and b2.dtype != jnp.bfloat16:
        b2 = b2.astype(jnp.bfloat16)
    ar, ai = a2[..., 0], a2[..., 1]
    br, bi = b2[..., 0], b2[..., 1]
    rr = jnp.einsum(eq, ar, br, precision=precision)
    ii = jnp.einsum(eq, ai, bi, precision=precision)
    ri = jnp.einsum(eq, ar, bi, precision=precision)
    ir = jnp.einsum(eq, ai, br, precision=precision)
    return jnp.stack([rr - ii, ri + ir], axis=-1)


def contract_dense_s(
    x2: jnp.ndarray, w2: jnp.ndarray, separable: bool = False, operator_type: str = "diagonal", channels_last: bool = False
) -> jnp.ndarray:
    """Grouped spectral contraction on split arrays.

    x2: (B, G, C_in/G, L, M, 2) — or (B, L, M, G, C_in/G, 2) channels-last.
    Weight layouts are identical in both (trailing pair axis):
      * diagonal, dense:    (G, C_in/G, C_out/G, L, M, 2) -> 'bgixy,gioxy->bgoxy'
      * dhconv, dense:      (G, C_in/G, C_out/G, L, 2)    -> 'bgixy,giox->bgoxy'
      * diagonal, separable:(G, C_in/G, L, M, 2)          -> 'bgixy,gixy->bgixy'
      * dhconv, separable:  (G, C_in/G, L, 2)             -> 'bgixy,gix->bgixy'
    Channels-last makes the per-degree GEMM contract over the minormost channel
    dim (batched over l), the MXU-native orientation.
    """
    if operator_type not in ("diagonal", "dhconv"):
        raise ValueError(f"Unknown operator type {operator_type}")
    if channels_last:
        if separable:
            eq = "bxygi,gixy->bxygi" if operator_type == "diagonal" else "bxygi,gix->bxygi"
        else:
            eq = "bxygi,gioxy->bxygo" if operator_type == "diagonal" else "bxygi,giox->bxygo"
    else:
        if separable:
            eq = "bgixy,gixy->bgixy" if operator_type == "diagonal" else "bgixy,gix->bgixy"
        else:
            eq = "bgixy,gioxy->bgoxy" if operator_type == "diagonal" else "bgixy,giox->bgoxy"
    return cmul_einsum_s(eq, x2, w2)


def compl_mul2d_s(x2: jnp.ndarray, w2: jnp.ndarray, channels_last: bool = False) -> jnp.ndarray:
    """Channel mixing shared across modes: (B,C_in,L,M,2) x (C_in,C_out,2);
    channels-last x2 is (B,L,M,C_in,2)."""
    eq = "bxyi,io->bxyo" if channels_last else "bixy,io->boxy"
    return cmul_einsum_s(eq, x2, w2)


def compl_muladd2d_s(x2: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray, channels_last: bool = False) -> jnp.ndarray:
    return compl_mul2d_s(x2, w2, channels_last=channels_last) + b2


def compl_exp_mul2d_s(x2: jnp.ndarray, w2: jnp.ndarray, channels_last: bool = False) -> jnp.ndarray:
    """Per-degree channel mixing: (B,C_in,L,M,2) x (L,C_in,C_out,2);
    channels-last x2 is (B,L,M,C_in,2)."""
    eq = "bxyi,xio->bxyo" if channels_last else "bixy,xio->boxy"
    return cmul_einsum_s(eq, x2, w2)


def compl_exp_muladd2d_s(x2: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray, channels_last: bool = False) -> jnp.ndarray:
    return compl_exp_mul2d_s(x2, w2, channels_last=channels_last) + b2
