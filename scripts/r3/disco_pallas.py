"""Pallas DISCO banded-contraction spike (VERDICT r2 item 6).

Implements the banded psi contraction
    t[bc, k, h, wo] = sum_{j, dw} psi[h, k, j, dw] * x[bc, h, j, wo*a + dw]
as one Pallas kernel — per output latitude, a windows-matrix GEMM
(BC*Wout, BL*WW) @ (BL*WW, K) built from VMEM-resident band rows — and
compares correctness + step time against the XLA grouped-conv path used by
ops/disco.py at FCN3-encoder scale (721x1440 -> 361x720).

Run on the TPU relay:  python scripts/r3/disco_pallas.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_band_contract(xs, psi, a: int, n_out_p: int):
    """xs: (BC, Hout, BL, Wpad) fp32; psi: (Hout, K, BL, WW) fp32.
    Returns t: (BC, Hout, K, n_out_p)."""
    BC, Hout, BL, Wpad = xs.shape
    _, K, _, WW = psi.shape

    # parity-split the window axis outside the kernel (Mosaic has no strided
    # vector slices and cannot split the lane dim in-kernel): element
    # [..., par, u] = x[..., u*a + par]
    Wpad2 = -(-Wpad // a) * a
    if Wpad2 != Wpad:
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (0, Wpad2 - Wpad)))
    W2 = Wpad2 // a
    xs = xs.reshape(BC, Hout, BL, W2, a).transpose(0, 1, 2, 4, 3)  # (BC, Hout, BL, a, W2)
    psi = psi.reshape(Hout, K, BL * WW)  # flattened outside: Mosaic can't merge lane dims

    def kernel(x_ref, p_ref, o_ref):
        # x_ref: (1, 1, BL, a, W2), p_ref: (1, K, BL*WW), o_ref: (1, 1, K, n_out_p)
        x = x_ref[0, 0]  # (BL, a, W2)
        # rank-1 accumulation on the VPU: Mosaic cannot assemble the windows
        # matrix (concat of slices with differing lane/sublane offsets)
        t = jnp.zeros((K, n_out_p), jnp.float32)
        for j in range(BL):
            for dw in range(WW):
                row = x[j, dw % a, dw // a : dw // a + n_out_p]  # (n_out_p,)
                t = t + p_ref[0, :, j * WW + dw][:, None] * row[None, :]
        o_ref[0, 0] = t

    return pl.pallas_call(
        kernel,
        grid=(BC, Hout),
        in_specs=[
            pl.BlockSpec((1, 1, BL, a, W2), lambda bc, h: (bc, h, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, BL * WW), lambda bc, h: (h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, K, n_out_p), lambda bc, h: (bc, h, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BC, Hout, K, n_out_p), jnp.float32),
    )(xs, psi)


def xla_band_contract(xs, psi, a: int, n_out_p: int):
    """The grouped-conv formulation from ops/disco.py (one fused conv)."""
    BC, Hout, BL, Wpad = xs.shape
    _, K, _, WW = psi.shape
    inp = xs.reshape(BC, Hout * BL, Wpad)
    filt = jnp.transpose(psi, (0, 1, 2, 3)).reshape(Hout * K, BL, WW)
    out = jax.lax.conv_general_dilated(
        inp, filt, window_strides=(a,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"), feature_group_count=Hout,
    )
    return out.reshape(BC, Hout, K, n_out_p)


def xla_band_contract_loop(xs, psi, a: int, n_out_p: int):
    """Round-2 formulation: one grouped conv per band row (re-reads the
    windowed input BL times)."""
    BC, Hout, BL, Wpad = xs.shape
    _, K, _, WW = psi.shape
    t = jnp.zeros((BC, Hout, K, n_out_p), jnp.float32)
    for j in range(BL):
        inp_j = xs[:, :, j, :]
        filt = jnp.transpose(psi[:, :, j, :], (0, 1, 2)).reshape(Hout * K, 1, WW)
        out = jax.lax.conv_general_dilated(
            inp_j, filt, window_strides=(a,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"), feature_group_count=Hout,
        )
        t = t + out.reshape(BC, Hout, K, n_out_p)
    return t


def bench(fn, *args, iters=8):
    out = fn(*args)
    out.block_until_ready()
    float(jnp.sum(out))  # relay sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters, out


def main():
    # FCN3-encoder scale: (721, 1440) -> (361, 720), kernel (3, 4)
    BC, Hout, BL, WW, K, a = 32, 361, 7, 9, 9, 2
    n_out_p = 720
    Wpad = (n_out_p - 1) * a + WW
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(BC, Hout, BL, Wpad).astype(np.float32))
    psi = jnp.asarray((rng.rand(Hout, K, BL, WW) * (rng.rand(Hout, K, BL, WW) > 0.6)).astype(np.float32))

    f_xla = jax.jit(partial(xla_band_contract, a=a, n_out_p=n_out_p))
    f_loop = jax.jit(partial(xla_band_contract_loop, a=a, n_out_p=n_out_p))
    f_pls = jax.jit(partial(pallas_band_contract, a=a, n_out_p=n_out_p))

    t_loop, out_loop = bench(f_loop, xs, psi)
    print(f"xla per-row conv loop (r2): {t_loop*1e3:8.2f} ms")
    t_xla, out_xla = bench(f_xla, xs, psi)
    print(f"xla fused grouped conv:     {t_xla*1e3:8.2f} ms")
    t_pls, out_pls = bench(f_pls, xs, psi)
    print(f"pallas rank-1 kernel:       {t_pls*1e3:8.2f} ms")
    print(f"loop vs fused diff: {float(jnp.max(jnp.abs(out_xla - out_loop))):.2e}")
    print(f"pallas vs fused diff: {float(jnp.max(jnp.abs(out_xla - out_pls))):.2e}"
          " (exact in interpreter mode; compiled-Mosaic discrepancy, see PERF.md)")


if __name__ == "__main__":
    main()
