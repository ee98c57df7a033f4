"""FFT dispatch layer.

All spectral code routes its Fourier transforms through these wrappers
instead of calling ``jnp.fft`` directly, for two reasons:

  1. **XLA CPU bug**: the CPU thunk runtime's FFT rejects non-major input
     layouts (``fft_thunk.cc: LayoutUtil::IsMonotonicWithDim0Major``), which
     layout assignment produces when the FFT sits inside a fused train step.
     On the CPU backend (tests / virtual mesh) we therefore compute the DFT
     as an explicit matmul against precomputed cos/sin matrices — exact, and
     test grids are tiny.
  2. **TPU tuning hook**: a matmul DFT computes only the ``mmax`` retained
     modes and runs on the MXU; for heavily truncated transforms it can beat
     the XLA FFT. ``FORCE_MATMUL`` flips every backend onto that path so the
     benchmark can compare.

Conventions follow ``numpy.fft`` (norm in {"backward", "ortho", "forward"}).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .precision import maybe_cast_table, transform_precision

__all__ = ["rfft", "irfft", "fft", "ifft", "rfft2", "irfft2", "use_matmul_fft"]

# set to True to force the matmul-DFT path on all backends (perf experiments)
FORCE_MATMUL = False



def _is_axon() -> bool:
    # the axon remote-TPU backend registers as plain "tpu" but implements no
    # FFT or complex ops; it is identifiable only from the environment
    import os

    return "axon" in os.environ.get("JAX_PLATFORMS", "").lower()


def use_matmul_fft() -> bool:
    # cpu: XLA thunk-runtime layout bug; axon (remote TPU): no FFT/complex
    # support at all — both use the matmul DFT.
    return FORCE_MATMUL or jax.default_backend() == "cpu" or _is_axon()


# ---------------------------------------------------------------------------
# split-complex variants: logical complex arrays are carried as real arrays
# with a trailing [re, im] axis, so no complex dtype ever reaches the device
# (the axon TPU backend implements no complex ops). The pair axis is LAST and
# the transformed logical axis is specified as if the pair axis didn't exist.
# ---------------------------------------------------------------------------


def _split_axis(x2, axis):
    """normalize a logical axis to the split array (which has +1 trailing dim)."""
    return axis if axis >= 0 else x2.ndim - 1 + axis


def rfft_s(x, n=None, axis=-1, norm=None, mout=None):
    """real (..., n) -> split (..., m, 2) along ``axis``.

    ``mout`` truncates the retained modes inside the DFT GEMM (see rfft_cl_s).
    """
    n = n or x.shape[axis]
    m_full = n // 2 + 1
    mout = min(mout or m_full, m_full)
    if not use_matmul_fft():
        out = from_complex(jnp.fft.rfft(x, n=n, axis=axis, norm=norm))
        if mout != m_full:
            out = out[..., :mout, :]
        return out if axis in (-1, x.ndim - 1) else jnp.moveaxis(out, -2, axis)
    xm = _move_last(x, axis)
    if xm.shape[-1] != n:
        if xm.shape[-1] > n:
            xm = xm[..., :n]
        else:
            xm = jnp.pad(xm, [(0, 0)] * (xm.ndim - 1) + [(0, n - xm.shape[-1])])
    c, s = _rdft_mats(n)
    if mout != m_full:
        c, s = c[:, :mout], s[:, :mout]
    c, s = maybe_cast_table(c, xm), maybe_cast_table(s, xm)
    f = _norm_factor(n, norm, inverse=False)
    re = jnp.einsum("...k,km->...m", xm, c, precision=transform_precision()) * f
    im = jnp.einsum("...k,km->...m", xm, s, precision=transform_precision()) * f
    out = jnp.stack([re, im], axis=-1)
    if axis not in (-1, x.ndim - 1):
        out = jnp.moveaxis(out, -2, axis)
    return out


def irfft_s(x2, n=None, axis=-1, norm=None):
    """split (..., m, 2) -> real (..., n) along ``axis``.

    Truncated inputs (m < n//2+1) use the row-sliced inverse table — exactly
    zero-padding the spectrum without the larger GEMM.
    """
    ax = _split_axis(x2, axis)
    xm = jnp.moveaxis(x2, ax, -2) if ax != x2.ndim - 2 else x2
    m = xm.shape[-2]
    n = n or 2 * (m - 1)
    if not use_matmul_fft():
        out = jnp.fft.irfft(to_complex(xm), n=n, axis=-1, norm=norm)
        return out if axis in (-1, out.ndim - 1) else jnp.moveaxis(out, -1, axis)
    n_half = n // 2 + 1
    if m > n_half:
        xm = xm[..., :n_half, :]
        m = n_half
    c, s = _irdft_mats(n)
    if m < n_half:
        c, s = c[:m], s[:m]
    c, s = maybe_cast_table(c, x2), maybe_cast_table(s, x2)
    f = _norm_factor(n, norm, inverse=True)
    out = (
        jnp.einsum("...m,mk->...k", xm[..., 0], c, precision=transform_precision())
        + jnp.einsum("...m,mk->...k", xm[..., 1], s, precision=transform_precision())
    ) * f
    if axis not in (-1, out.ndim - 1):
        out = jnp.moveaxis(out, -1, axis)
    return out


def fft_s(x2, n=None, axis=-1, norm=None, sign: int = -1):
    """split (..., n, 2) -> split (..., n, 2) complex DFT along logical ``axis``."""
    ax = _split_axis(x2, axis)
    xm = jnp.moveaxis(x2, ax, -2) if ax != x2.ndim - 2 else x2
    n = n or xm.shape[-2]
    if not use_matmul_fft():
        hfn = jnp.fft.fft if sign == -1 else jnp.fft.ifft
        out = from_complex(hfn(to_complex(xm), n=n, axis=-1, norm=norm))
        return out if ax == x2.ndim - 2 else jnp.moveaxis(out, -2, ax)
    c, s = _dft_mats(n, sign=sign)
    f = _norm_factor(n, norm, inverse=(sign == +1))
    xr, xi = xm[..., 0], xm[..., 1]
    re = (jnp.einsum("...k,kn->...n", xr, c, precision=transform_precision()) - jnp.einsum("...k,kn->...n", xi, s, precision=transform_precision())) * f
    im = (jnp.einsum("...k,kn->...n", xr, s, precision=transform_precision()) + jnp.einsum("...k,kn->...n", xi, c, precision=transform_precision())) * f
    out = jnp.stack([re, im], axis=-1)
    if ax != x2.ndim - 2:
        out = jnp.moveaxis(out, -2, ax)
    return out


def ifft_s(x2, n=None, axis=-1, norm=None):
    return fft_s(x2, n=n, axis=axis, norm=norm, sign=+1)


def rfft2_s(x, s=None, axes=(-2, -1), norm=None):
    """real (..., H, W) -> split (..., lH, mW, 2)."""
    n0 = s[0] if s else x.shape[axes[0]]
    n1 = s[1] if s else x.shape[axes[1]]
    y = rfft_s(x, n=n1, axis=axes[1], norm=norm)
    return fft_s(y, n=n0, axis=axes[0], norm=norm)


def irfft2_s(x2, s=None, axes=(-2, -1), norm=None):
    n0 = s[0] if s else None
    n1 = s[1] if s else None
    y = ifft_s(x2, n=n0, axis=axes[0], norm=norm)
    return irfft_s(y, n=n1, axis=axes[1], norm=norm)


# ---------------------------------------------------------------------------
# channels-last split variants: logical layout (..., S, C) with the transformed
# axis S at logical -2 and channels last; split arrays carry the [re, im] pair
# axis LAST, i.e. (..., S, C, 2). On the matmul path these are single einsums
# whose contracting dim sits next to the free channel dim — the orientation the
# MXU consumes without relayout copies (the NCHW forms cost an extra HBM pass
# per GEMM at 0.25 deg; see PERF.md layout measurements).
# ---------------------------------------------------------------------------


def rfft_cl_s(x, n=None, norm=None, mout=None):
    """real (..., W, C) -> split (..., M, C, 2); DFT over the -2 axis.

    ``mout`` truncates the output modes *inside* the DFT GEMM (the table is
    (n, mout) instead of (n, n//2+1)). At 0.25 deg the retained fraction is
    ~1/6 — computing all modes and slicing after would waste 6x the FLOPs and
    HBM of the dominant full-resolution transform GEMMs.
    """
    n = n or x.shape[-2]
    m_full = n // 2 + 1
    mout = min(mout or m_full, m_full)
    if not use_matmul_fft():
        out = from_complex(jnp.fft.rfft(x, n=n, axis=-2, norm=norm))
        return out[..., :mout, :, :] if mout != m_full else out
    if x.shape[-2] != n:
        if x.shape[-2] > n:
            x = x[..., :n, :]
        else:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, n - x.shape[-2]), (0, 0)])
    c, s = _rdft_mats(n)
    if mout != m_full:
        c, s = c[:, :mout], s[:, :mout]
    c, s = maybe_cast_table(c, x), maybe_cast_table(s, x)
    f = _norm_factor(n, norm, inverse=False)
    re = jnp.einsum("...wc,wm->...mc", x, c, precision=transform_precision()) * f
    im = jnp.einsum("...wc,wm->...mc", x, s, precision=transform_precision()) * f
    return jnp.stack([re, im], axis=-1)


def irfft_cl_s(x2, n=None, norm=None):
    """split (..., M, C, 2) -> real (..., W, C); inverse DFT over the -3 axis.

    Truncated inputs (M < n//2+1) multiply against the row-sliced table —
    exactly equivalent to zero-padding the spectrum, without the 6x larger
    GEMM at full resolution.
    """
    m = x2.shape[-3]
    n = n or 2 * (m - 1)
    if not use_matmul_fft():
        return jnp.fft.irfft(to_complex(x2), n=n, axis=-2, norm=norm)
    n_half = n // 2 + 1
    if m > n_half:
        x2 = x2[..., :n_half, :, :]
        m = n_half
    c, s = _irdft_mats(n)
    if m < n_half:
        c, s = c[:m], s[:m]
    c, s = maybe_cast_table(c, x2), maybe_cast_table(s, x2)
    f = _norm_factor(n, norm, inverse=True)
    return (
        jnp.einsum("...mc,mw->...wc", x2[..., 0], c, precision=transform_precision())
        + jnp.einsum("...mc,mw->...wc", x2[..., 1], s, precision=transform_precision())
    ) * f


def fft_lat_cl_s(x2, n=None, norm=None, sign: int = -1):
    """split (..., K, M, C, 2) -> split (..., K, M, C, 2): complex DFT over the
    logical -3 (latitude) axis, channels-last."""
    n = n or x2.shape[-4]
    if not use_matmul_fft():
        hfn = jnp.fft.fft if sign == -1 else jnp.fft.ifft
        return from_complex(hfn(to_complex(x2), n=n, axis=-3, norm=norm))
    c, s = _dft_mats(n, sign=sign)
    c, s = maybe_cast_table(c, x2), maybe_cast_table(s, x2)
    f = _norm_factor(n, norm, inverse=(sign == +1))
    xr, xi = x2[..., 0], x2[..., 1]
    re = (
        jnp.einsum("...kmc,kl->...lmc", xr, c, precision=transform_precision())
        - jnp.einsum("...kmc,kl->...lmc", xi, s, precision=transform_precision())
    ) * f
    im = (
        jnp.einsum("...kmc,kl->...lmc", xr, s, precision=transform_precision())
        + jnp.einsum("...kmc,kl->...lmc", xi, c, precision=transform_precision())
    ) * f
    return jnp.stack([re, im], axis=-1)


def ifft_lat_cl_s(x2, n=None, norm=None):
    return fft_lat_cl_s(x2, n=n, norm=norm, sign=+1)


def to_complex(x2):
    return jax.lax.complex(x2[..., 0], x2[..., 1])


def from_complex(c):
    return jnp.stack([c.real, c.imag], axis=-1)


def _norm_factor(n: int, norm: str | None, inverse: bool) -> float:
    norm = norm or "backward"
    if norm == "backward":
        return 1.0 / n if inverse else 1.0
    if norm == "forward":
        return 1.0 if inverse else 1.0 / n
    if norm == "ortho":
        return 1.0 / math.sqrt(n)
    raise ValueError(f"unknown norm {norm}")


@lru_cache(maxsize=None)
def _rdft_mats(n: int):
    """cos/sin matrices (n, n//2+1) for the forward real DFT."""
    k = np.arange(n)[:, None]
    m = np.arange(n // 2 + 1)[None, :]
    ang = 2.0 * np.pi * k * m / n
    return np.cos(ang).astype(np.float32), -np.sin(ang).astype(np.float32)


@lru_cache(maxsize=None)
def _irdft_mats(n: int):
    """cos/sin matrices (n//2+1, n) for the inverse real DFT with one-sided
    doubling folded in."""
    m = np.arange(n // 2 + 1)[:, None]
    k = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * m / n
    w = np.full((n // 2 + 1, 1), 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    return (w * np.cos(ang)).astype(np.float32), (-w * np.sin(ang)).astype(np.float32)


@lru_cache(maxsize=None)
def _dft_mats(n: int, sign: int):
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * m / n * sign
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _move_last(x, axis):
    return jnp.moveaxis(x, axis, -1) if axis not in (-1, x.ndim - 1) else x


def _unmove_last(x, axis, ndim):
    return jnp.moveaxis(x, -1, axis) if axis not in (-1, ndim - 1) else x


def rfft(x, n=None, axis=-1, norm=None):
    n = n or x.shape[axis]
    if not use_matmul_fft():
        return jnp.fft.rfft(x, n=n, axis=axis, norm=norm)
    xm = _move_last(x, axis)
    if xm.shape[-1] != n:
        if xm.shape[-1] > n:
            xm = xm[..., :n]
        else:
            xm = jnp.pad(xm, [(0, 0)] * (xm.ndim - 1) + [(0, n - xm.shape[-1])])
    c, s = _rdft_mats(n)
    f = _norm_factor(n, norm, inverse=False)
    re = jnp.einsum("...k,km->...m", xm, c, precision=transform_precision()) * f
    im = jnp.einsum("...k,km->...m", xm, s, precision=transform_precision()) * f
    out = jax.lax.complex(re, im)
    return _unmove_last(out, axis, x.ndim)


def irfft(x, n=None, axis=-1, norm=None):
    n = n or 2 * (x.shape[axis] - 1)
    if not use_matmul_fft():
        return jnp.fft.irfft(x, n=n, axis=axis, norm=norm)
    xm = _move_last(x, axis)
    n_half = n // 2 + 1
    if xm.shape[-1] != n_half:
        if xm.shape[-1] > n_half:
            xm = xm[..., :n_half]
        else:
            xm = jnp.pad(xm, [(0, 0)] * (xm.ndim - 1) + [(0, n_half - xm.shape[-1])])
    c, s = _irdft_mats(n)
    f = _norm_factor(n, norm, inverse=True)
    out = (
        jnp.einsum("...m,mk->...k", xm.real, c, precision=transform_precision())
        + jnp.einsum("...m,mk->...k", xm.imag, s, precision=transform_precision())
    ) * f
    return _unmove_last(out, axis, x.ndim)


def fft(x, n=None, axis=-1, norm=None):
    n = n or x.shape[axis]
    if not use_matmul_fft():
        return jnp.fft.fft(x, n=n, axis=axis, norm=norm)
    xm = _move_last(x, axis)
    c, s = _dft_mats(n, sign=-1)
    f = _norm_factor(n, norm, inverse=False)
    xr, xi = jnp.real(xm), jnp.imag(xm)
    re = (jnp.einsum("...k,km->...m", xr, c, precision=transform_precision()) - jnp.einsum("...k,km->...m", xi, s, precision=transform_precision())) * f
    im = (jnp.einsum("...k,km->...m", xr, s, precision=transform_precision()) + jnp.einsum("...k,km->...m", xi, c, precision=transform_precision())) * f
    return _unmove_last(jax.lax.complex(re, im), axis, x.ndim)


def ifft(x, n=None, axis=-1, norm=None):
    n = n or x.shape[axis]
    if not use_matmul_fft():
        return jnp.fft.ifft(x, n=n, axis=axis, norm=norm)
    xm = _move_last(x, axis)
    c, s = _dft_mats(n, sign=+1)
    f = _norm_factor(n, norm, inverse=True)
    xr, xi = jnp.real(xm), jnp.imag(xm)
    re = (jnp.einsum("...k,km->...m", xr, c, precision=transform_precision()) - jnp.einsum("...k,km->...m", xi, s, precision=transform_precision())) * f
    im = (jnp.einsum("...k,km->...m", xr, s, precision=transform_precision()) + jnp.einsum("...k,km->...m", xi, c, precision=transform_precision())) * f
    return _unmove_last(jax.lax.complex(re, im), axis, x.ndim)


def rfft2(x, s=None, axes=(-2, -1), norm=None):
    if not use_matmul_fft():
        return jnp.fft.rfft2(x, s=s, axes=axes, norm=norm)
    n0 = s[0] if s else x.shape[axes[0]]
    n1 = s[1] if s else x.shape[axes[1]]
    y = rfft(x, n=n1, axis=axes[1], norm=norm)
    return fft(y, n=n0, axis=axes[0], norm=norm)


def irfft2(x, s=None, axes=(-2, -1), norm=None):
    if not use_matmul_fft():
        return jnp.fft.irfft2(x, s=s, axes=axes, norm=norm)
    n0 = s[0] if s else x.shape[axes[0]]
    n1 = s[1] if s else 2 * (x.shape[axes[1]] - 1)
    y = ifft(x, n=n0, axis=axes[0], norm=norm)
    return irfft(y, n=n1, axis=axes[1], norm=norm)
