"""Bilinear resampling on the sphere (torch-harmonics ``ResampleS2``
equivalent; bound by the reference at fourcastnet3.py:356-358).

Separable bilinear interpolation between equiangular (or Legendre-Gauss)
lat-lon grids, with two equivalent applications:

* ``gather`` — latitude/longitude lerps via precomputed index gathers
  (cheap, HBM-bound; the serial default).
* ``matmul`` — the same lerps as contractions with constant banded
  interpolation matrices. Under SPMD this is the distributed formulation
  (the reference's ``DistributedResampleS2`` role): GSPMD shards matmul
  contractions with partial-GEMM + reduce patterns, whereas the gather's
  data-dependent latitude indexing makes it all-gather the whole sharded
  field first — measured 456 MB of all-gathers per decoder at the 0.5-deg
  distributed FCN3 train step (PERF.md round-4 census follow-up).

``method="auto"`` (the model-facing default) picks matmul exactly when a
device mesh with a nontrivial spatial carving is active at trace time.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from makani_tpu.ops.quadrature import precompute_latitudes

__all__ = ["ResampleS2"]


def _spatially_sharded() -> bool:
    try:
        from makani_tpu.parallel import mesh as mesh_mod

        m = mesh_mod.get_mesh()
        return m is not None and m.shape.get("h", 1) * m.shape.get("w", 1) > 1
    except Exception:
        return False


class ResampleS2:
    def __init__(self, nlat_in, nlon_in, nlat_out, nlon_out, grid_in="equiangular", grid_out="equiangular", mode="bilinear", method="gather"):
        if mode != "bilinear":
            raise NotImplementedError(f"resampling mode {mode}")
        if method not in ("gather", "matmul", "auto"):
            raise ValueError(f"resampling method {method}")
        self.method = method
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

        # constant banded interpolation matrices (the matmul formulation);
        # identical arithmetic: row o of lat_mat holds (1-w, w) at columns
        # (j, j+1), row p of lon_mat holds (1-v, v) at (k0, k1) with wrap
        lat_mat = np.zeros((nlat_out, nlat_in), np.float32)
        lat_mat[np.arange(nlat_out), self.lat_idx] = 1.0 - self.lat_w[:, 0]
        lat_mat[np.arange(nlat_out), self.lat_idx + 1] += self.lat_w[:, 0]
        lon_mat = np.zeros((nlon_out, nlon_in), np.float32)
        lon_mat[np.arange(nlon_out), self.lon_idx0] = 1.0 - self.lon_w
        lon_mat[np.arange(nlon_out), self.lon_idx1] += self.lon_w
        self.lat_mat = lat_mat
        self.lon_mat = lon_mat

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        method = self.method
        if method == "auto":
            method = "matmul" if _spatially_sharded() else "gather"
        if method == "matmul":
            Ml = jnp.asarray(self.lat_mat, dtype=x.dtype)
            Mp = jnp.asarray(self.lon_mat, dtype=x.dtype)
            y = jnp.einsum("oh,...hw->...ow", Ml, x)
            return jnp.einsum("pw,...hw->...hp", Mp, y)
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
