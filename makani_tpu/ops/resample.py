"""Bilinear resampling on the sphere (torch-harmonics ``ResampleS2``
equivalent; bound by the reference at fourcastnet3.py:356-358).

Separable bilinear interpolation between equiangular (or Legendre-Gauss)
lat-lon grids: latitude via gathered linear interpolation, longitude via
periodic linear interpolation. Precomputed indices/weights in numpy; the
apply is two gathers + lerps (cheap, HBM-bound).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from makani_tpu.ops.quadrature import precompute_latitudes

__all__ = ["ResampleS2"]


class ResampleS2:
    def __init__(self, nlat_in, nlon_in, nlat_out, nlon_out, grid_in="equiangular", grid_out="equiangular", mode="bilinear"):
        if mode != "bilinear":
            raise NotImplementedError(f"resampling mode {mode}")
        self.in_shape = (nlat_in, nlon_in)
        self.out_shape = (nlat_out, nlon_out)

        ti, _ = precompute_latitudes(nlat_in, grid=grid_in)
        to, _ = precompute_latitudes(nlat_out, grid=grid_out)

        j = np.clip(np.searchsorted(ti, to) - 1, 0, nlat_in - 2)
        w = (to - ti[j]) / (ti[j + 1] - ti[j])
        self.lat_idx = j.astype(np.int32)
        self.lat_w = np.clip(w, 0.0, 1.0).astype(np.float32).reshape(-1, 1)

        phi_in = np.arange(nlon_in) * (2 * np.pi / nlon_in)
        phi_out = np.arange(nlon_out) * (2 * np.pi / nlon_out)
        pos = phi_out / (2 * np.pi / nlon_in)
        k = np.floor(pos).astype(np.int64)
        v = (pos - k).astype(np.float32)
        self.lon_idx0 = (k % nlon_in).astype(np.int32)
        self.lon_idx1 = ((k + 1) % nlon_in).astype(np.int32)
        self.lon_w = v.astype(np.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # latitude lerp
        lo = x[..., self.lat_idx, :]
        hi = x[..., self.lat_idx + 1, :]
        w = jnp.asarray(self.lat_w, dtype=x.dtype)
        y = lo + (hi - lo) * w
        # longitude periodic lerp
        y0 = y[..., self.lon_idx0]
        y1 = y[..., self.lon_idx1]
        v = jnp.asarray(self.lon_w, dtype=x.dtype)
        return y0 + (y1 - y0) * v
