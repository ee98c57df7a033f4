"""Fused instance-norm primitive with a hand-derived VJP.

One weighted formulation covers all three norm variants in the tree
(ref ``makani/models/common/layer_norm.py:30-153`` and
``makani/mpu/layer_norm.py:108-253``):

  * plain instance norm           — uniform q = 1/(H*W)
  * padded-latitude instance norm — q = 1/(nlat_phys*W) on valid rows, 0 on pads
  * geometric (quadrature) norm   — q = quadrature weights (sum 1)

with per-pixel stat weights q(h, w), statistics

    mu  = sum q * x          (per batch, channel)
    var = sum q * (x - mu)^2

and output ``y = (x - mu) * rsig * w + b``.

Why a custom VJP: XLA's autodiff backward of the two-pass norm reads the
full-resolution activation ~8x (HLO census, scripts/r3/analyze_hlo.py —
~4.8 GB per full-res norm backward at B=3); the closed form

    dx = rsig * (w*g  -  q * S_G  -  q * xhat * S_Gxhat)
    S_G      = w_c * sum_sp g          (unweighted sums!)
    S_Gxhat  = w_c * sum_sp g * xhat
    dw_c     = sum_{b,sp} g * xhat,   db_c = sum_{b,sp} g

needs two reads of (g, x) plus one dx write (~3.0 GB). The unweighted sums
in S_G/S_Gxhat are exact: d var/dx_j = 2 q_j (x_j - mu) places q on the
*output* pixel, so zero-weight (padded) pixels still receive the pure
elementwise gradient rsig*w*g, matching the unfused autodiff exactly.

All reductions are plain jnp ops, so under pjit/GSPMD the spatial sums become
the cross-device psums the reference implements by hand with Welford
all-reduces (mpu/layer_norm.py:54-105).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["weighted_instance_norm_affine"]


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def weighted_instance_norm_affine(x, w, b, q, channels_last: bool, eps: float):
    """Instance norm with per-pixel stat weights and affine transform.

    Args:
      x: (B, C, H, W) or (B, H, W, C) when ``channels_last``.
      w, b: (C,) affine scale/shift (pass ones/zeros for affine=False).
      q: stat weights broadcastable to the spatial dims and summing to 1 —
         shape (H, W), (H, 1), or (1, 1) etc.
      channels_last: layout switch.
      eps: variance epsilon.
    """
    y, _ = _fwd_impl(x, w, b, q, channels_last, eps)
    return y


def _spatial_axes(channels_last):
    return (-3, -2) if channels_last else (-2, -1)


def _qexp(q, channels_last):
    # q -> broadcastable against x: (H, W, 1) for NHWC, (H, W) for NCHW
    return q[..., None] if channels_last else q


def _cexp(v, channels_last):
    # per-channel vector -> broadcastable against x
    return v if channels_last else v[:, None, None]


def _fwd_impl(x, w, b, q, channels_last, eps):
    sp = _spatial_axes(channels_last)
    xs = x.astype(jnp.float32)
    qe = _qexp(q.astype(jnp.float32), channels_last)
    mean = jnp.sum(xs * qe, axis=sp, keepdims=True)
    var = jnp.sum(jnp.square(xs - mean) * qe, axis=sp, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    we = _cexp(w.astype(jnp.float32), channels_last)
    be = _cexp(b.astype(jnp.float32), channels_last)
    y = ((xs - mean) * rsig * we + be).astype(x.dtype)
    return y, (mean, rsig)


def _fwd(x, w, b, q, channels_last, eps):
    y, (mean, rsig) = _fwd_impl(x, w, b, q, channels_last, eps)
    return y, (x, w, q, mean, rsig)


def _bwd(channels_last, eps, res, g):
    x, w, q, mean, rsig = res
    sp = _spatial_axes(channels_last)
    qe = _qexp(q.astype(jnp.float32), channels_last)
    we = _cexp(w.astype(jnp.float32), channels_last)

    g32 = g.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rsig

    # pass 1: per-(b, c) unweighted sums (shared by dw/db and dx)
    sum_g = jnp.sum(g32, axis=sp, keepdims=True)
    sum_gx = jnp.sum(g32 * xhat, axis=sp, keepdims=True)

    # affine grads: reduce the per-(b,c) sums over batch; (b,1,1,c)/(b,c,1,1) -> (c,)
    db = jnp.sum(jnp.squeeze(sum_g, axis=sp), axis=0)
    dw = jnp.sum(jnp.squeeze(sum_gx, axis=sp), axis=0)

    # pass 2: dx
    dx = (rsig * (we * g32 - qe * we * sum_g - qe * xhat * we * sum_gx)).astype(x.dtype)
    return dx, dw.astype(w.dtype), db.astype(w.dtype), None


weighted_instance_norm_affine.defvjp(_fwd, _bwd)
