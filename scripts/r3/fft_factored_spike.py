"""Cooley-Tukey factored matmul-DFT spike (round 3, post-baseline margin).

The truncated dense matmul-DFT (fft_compat.rfft_cl_s) does
2*rows*n*mout*2 real MACs. Factoring n = n1*n2 (720 = 45*16, decimation in
time j = n1q... here j = n2_outer? see below) computes the same mout modes
in two small GEMMs:

  stage 1:  Y[a, r] = sum_b x[16 b + a] e^(-2 pi i b r / 45)   (K=45 GEMM)
  stage 2:  X[45 q + r] = sum_a W[a, 45q + r] Y[a, r]          (K=16 GEMM)

~2.4x fewer flops at mout=121. This script checks numerical parity against
the dense path and times both (fwd + inverse) at the bench's full-res
channels-last shape (3, 361, 720, 384) on the real chip.

Run: python scripts/r3/fft_factored_spike.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp

from makani_tpu.ops import fft_compat as fc

N = 720
N1, N2 = 45, 16  # j = N2 * b + a, b < N1, a < N2; inner DFT length N1
MOUT = 121
Q = -(-MOUT // N1)  # quotients per residue (3 at 121/45)


def _factored_tables(n, n1, n2, mout, dtype=np.float32):
    q = -(-mout // n1)
    b = np.arange(n1)
    r = np.arange(n1)
    ang1 = 2.0 * np.pi * b[:, None] * r[None, :] / n1
    c1, s1 = np.cos(ang1).astype(dtype), (-np.sin(ang1)).astype(dtype)  # (b, r)
    a = np.arange(n2)[:, None, None]
    rr = np.arange(n1)[None, :, None]
    qq = np.arange(q)[None, None, :]
    m = n1 * qq + rr
    ang2 = 2.0 * np.pi * a * m / n
    c2, s2 = np.cos(ang2).astype(dtype), (-np.sin(ang2)).astype(dtype)  # (a, r, q)
    return c1, s1, c2, s2


def rfft_cl_factored(x, norm="forward"):
    """real (..., 720, C) -> split (..., 121, C, 2)."""
    c1, s1, c2, s2 = _factored_tables(N, N1, N2, MOUT)
    c1, s1, c2, s2 = (jnp.asarray(t) for t in (c1, s1, c2, s2))
    f = 1.0 / N if norm == "forward" else 1.0
    pre = x.shape[:-2]
    C = x.shape[-1]
    xg = x.reshape(pre + (N1, N2, C))  # j = N2*b + a -> [b, a]
    # stage 1: DFT_45 over b per residue a
    yre = jnp.einsum("...bac,br->...rac", xg, c1)
    yim = jnp.einsum("...bac,br->...rac", xg, s1)
    # stage 2: twiddle-DFT_16 over a, batched over r, emitting q
    zre = jnp.einsum("...rac,arq->...rqc", yre, c2) - jnp.einsum("...rac,arq->...rqc", yim, s2)
    zim = jnp.einsum("...rac,arq->...rqc", yre, s2) + jnp.einsum("...rac,arq->...rqc", yim, c2)
    # m = 45 q + r -> (q, r) major order then slice
    zre = jnp.moveaxis(zre, -2, -3).reshape(pre + (N1 * Q, C))[..., :MOUT, :]
    zim = jnp.moveaxis(zim, -2, -3).reshape(pre + (N1 * Q, C))[..., :MOUT, :]
    return jnp.stack([zre * f, zim * f], axis=-1)


def irfft_cl_factored(x2, norm="forward"):
    """split (..., 121, C, 2) -> real (..., 720, C); adjoint factorization."""
    c1, s1, c2, s2 = _factored_tables(N, N1, N2, MOUT)
    # one-sided doubling weights on the mode axis
    w = np.full((MOUT,), 2.0, np.float32)
    w[0] = 1.0
    f = 1.0 if norm == "forward" else 1.0 / N
    pre = x2.shape[:-3]
    C = x2.shape[-2]
    # pad modes to (r, q) grid: m = 45 q + r
    pad = N1 * Q - MOUT
    xre = jnp.pad(x2[..., 0] * w[:, None], [(0, 0)] * (x2.ndim - 3) + [(0, pad), (0, 0)])
    xim = jnp.pad(x2[..., 1] * w[:, None], [(0, 0)] * (x2.ndim - 3) + [(0, pad), (0, 0)])
    xre = xre.reshape(pre + (Q, N1, C))
    xim = xim.reshape(pre + (Q, N1, C))
    c2j, s2j = jnp.asarray(c2), jnp.asarray(s2)
    # stage 2 adjoint: U[a, r] = sum_q X[q, r] conj(W[a, r, q])
    ure = jnp.einsum("...qrc,arq->...rac", xre, c2j) + jnp.einsum("...qrc,arq->...rac", xim, s2j)
    uim = jnp.einsum("...qrc,arq->...rac", xim, c2j) - jnp.einsum("...qrc,arq->...rac", xre, s2j)
    # stage 1 adjoint: x[b, a] = Re sum_r U[r, a] e^{+2 pi i b r / 45}
    c1j, s1j = jnp.asarray(c1), jnp.asarray(s1)
    xg = jnp.einsum("...rac,br->...bac", ure, c1j) + jnp.einsum("...rac,br->...bac", uim, s1j)
    return (xg * f).reshape(pre + (N, C))


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    rng = np.random.default_rng(0)
    B, H, C = 3, 361, 384
    x = jnp.asarray(rng.standard_normal((B, H, N, C)).astype(np.float32))

    dense_f = jax.jit(lambda v: fc.rfft_cl_s(v, n=N, norm="forward", mout=MOUT))
    fact_f = jax.jit(rfft_cl_factored)
    yd = dense_f(x)
    yf = fact_f(x)
    err = float(jnp.max(jnp.abs(yd - yf)))
    print("fwd max abs err:", err)

    dense_i = jax.jit(lambda v: fc.irfft_cl_s(v, n=N, norm="forward"))
    fact_i = jax.jit(irfft_cl_factored)
    zd = dense_i(yd)
    zf = fact_i(yd)
    erri = float(jnp.max(jnp.abs(zd - zf)))
    print("inv max abs err:", erri)

    def timeit(fn, arg, iters=20):
        r = fn(arg)
        float(jnp.sum(r[..., 0] if r.ndim > 4 else r).astype(jnp.float32))  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(arg)
        float(jnp.sum(r[..., 0] if r.ndim > 4 else r).astype(jnp.float32))
        return (time.perf_counter() - t0) / iters * 1e3

    # bf16 path as the model uses
    xb = x.astype(jnp.bfloat16)
    yb = yd.astype(jnp.bfloat16)
    for name, fn, arg in [
        ("dense fwd f32", dense_f, x),
        ("factored fwd f32", fact_f, x),
        ("dense inv f32", dense_i, yd),
        ("factored inv f32", fact_i, yd),
        ("dense fwd bf16", dense_f, xb),
        ("factored fwd bf16", fact_f, xb),
        ("dense inv bf16", dense_i, yb),
        ("factored inv bf16", fact_i, yb),
    ]:
        print(f"{name}: {timeit(fn, arg):.3f} ms")


if __name__ == "__main__":
    main()
