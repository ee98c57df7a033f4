"""Distributed bilinear sphere resampling over the ("h", "w") mesh axes.

The reference wires ``DistributedResampleS2`` into FCN3's decoders
(ref makani/models/networks/fourcastnet3.py:356-358); without it, the
serial resample's latitude/longitude gathers make GSPMD all-gather the
whole sharded field in front of every decoder (measured: 456 MB of
all-gathers per 0.5-deg FCN3 train step, PERF.md round-4), and the dense
matmul formulation only trades them for equally large contraction
collectives. Bilinear interpolation is banded — every output row needs at
most two adjacent input rows, every output column two adjacent columns —
so the shard_map body below assembles a one-sided latitude halo via
``ppermute`` (the same pattern as the halo DISCO conv, parallel/disco.py)
plus a single wrapped longitude column, and all remaining work is local.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from makani_tpu.ops.resample import ResampleS2
from makani_tpu.parallel import mesh as mesh_mod

__all__ = ["DistributedResampleS2", "make_resample"]


def _pad_up(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


class DistributedResampleS2(ResampleS2):
    """ResampleS2 with halo-exchange shard_map execution over ("h", "w").

    Same global contract as the serial op: x (B, C, Hin, Win) sharded
    P(batch, None, h, w) -> y (B, C, Hout, Wout) sharded the same way.
    """

    def __init__(self, nlat_in, nlon_in, nlat_out, nlon_out, grid_in="equiangular", grid_out="equiangular", mode="bilinear", h_axis="h", w_axis="w"):
        super().__init__(nlat_in, nlon_in, nlat_out, nlon_out, grid_in=grid_in, grid_out=grid_out, mode=mode, method="gather")
        self.mesh = mesh_mod.get_mesh()
        self.h_axis, self.w_axis = h_axis, w_axis
        h = self.h_size = self.mesh.shape.get(h_axis, 1)
        w = self.w_size = self.mesh.shape.get(w_axis, 1)

        if nlon_in % w or nlon_out % w:
            raise ValueError("distributed resample requires lon divisible by w")

        self.Hin_pad = _pad_up(nlat_in, h)
        self.Hout_pad = _pad_up(nlat_out, h)
        Hl_in, Hl_out = self.Hin_pad // h, self.Hout_pad // h
        Wl_in, Wl_out = nlon_in // w, nlon_out // w

        # padded output rows replicate the last real row's interpolation
        # stencil (their values are sliced away in __call__)
        li = np.concatenate([self.lat_idx, np.full(self.Hout_pad - nlat_out, self.lat_idx[-1], np.int32)])
        lw = np.concatenate([self.lat_w[:, 0], np.full(self.Hout_pad - nlat_out, self.lat_w[-1, 0], np.float32)])

        # one-sided latitude halos: rank r's outputs need input rows
        # [li.min(), li.max()+1] of its slice; anything outside the local
        # input block [r*Hl_in, (r+1)*Hl_in) comes from the neighbors
        need_lo = np.zeros(h, np.int64)
        need_hi = np.zeros(h, np.int64)
        for r in range(h):
            rows = li[r * Hl_out : (r + 1) * Hl_out]
            need_lo[r] = r * Hl_in - rows.min()
            need_hi[r] = (rows.max() + 1) - ((r + 1) * Hl_in - 1)
        self.HU = int(max(need_lo.max(), 0))
        self.HD = int(max(need_hi.max(), 0))
        if self.HU > Hl_in or self.HD > Hl_in:
            raise ValueError(f"lat halo ({self.HU}/{self.HD}) exceeds the local block ({Hl_in}); lower h for this resolution")

        # per-rank local row/weight tables into the (HU + Hl_in + HD) block
        lrow = np.zeros((h, Hl_out), np.int32)
        wrow = np.zeros((h, Hl_out), np.float32)
        for r in range(h):
            lrow[r] = li[r * Hl_out : (r + 1) * Hl_out] - (r * Hl_in - self.HU)
            wrow[r] = lw[r * Hl_out : (r + 1) * Hl_out]
        self._lrow, self._wrow = lrow, wrow

        # rank-independent local longitude stencil: output column u of any
        # rank c sits at global position (c*Wl_out + u) * Win/Wout =
        # c*Wl_in + u*Win/Wout, i.e. local k0 = floor(u*Win/Wout) < Wl_in
        # and k1 = k0 + 1 at most touches the right neighbor's first column
        pos = np.arange(Wl_out) * (nlon_in / nlon_out)
        self._k0 = np.floor(pos).astype(np.int32)
        self._kv = (pos - self._k0).astype(np.float32)

        self._Hl_in, self._Hl_out = Hl_in, Hl_out
        self._fn = jax.shard_map(
            self._body,
            mesh=self.mesh,
            in_specs=(P(("batch", "ensemble"), None, self.h_axis, self.w_axis),),
            out_specs=P(("batch", "ensemble"), None, self.h_axis, self.w_axis),
            check_vma=False,
        )

    def _body(self, x):
        """x local (B, C, Hl_in, Wl_in) -> y local (B, C, Hl_out, Wl_out)."""
        h, w = self.h_size, self.w_size
        HU, HD = self.HU, self.HD
        B, C = x.shape[0], x.shape[1]

        idx = np.arange(h)
        if h > 1 and HU > 0:
            top = lax.ppermute(x[:, :, -HU:, :], self.h_axis, perm=list(zip(idx[:-1], idx[1:])))
        else:
            top = jnp.zeros((B, C, HU, x.shape[-1]), x.dtype)
        if h > 1 and HD > 0:
            bot = lax.ppermute(x[:, :, :HD, :], self.h_axis, perm=list(zip(idx[1:], idx[:-1])))
        else:
            bot = jnp.zeros((B, C, HD, x.shape[-1]), x.dtype)
        blk = jnp.concatenate([top, x, bot], axis=2) if (HU or HD) else x

        rank = lax.axis_index(self.h_axis) if h > 1 else 0
        lrow = jnp.take(jnp.asarray(self._lrow), rank, axis=0)  # (Hl_out,)
        wrow = jnp.take(jnp.asarray(self._wrow), rank, axis=0).astype(x.dtype)
        lo = jnp.take(blk, lrow, axis=2)
        hi = jnp.take(blk, lrow + 1, axis=2)
        y = lo + (hi - lo) * wrow[None, None, :, None]

        # periodic longitude: one wrapped column from the right neighbor
        if w > 1:
            widx = np.arange(w)
            right = lax.ppermute(y[..., :1], self.w_axis, perm=[((q + 1) % w, q) for q in widx])
        else:
            right = y[..., :1]
        ya = jnp.concatenate([y, right], axis=-1)
        y0 = jnp.take(ya, jnp.asarray(self._k0), axis=-1)
        y1 = jnp.take(ya, jnp.asarray(self._k0 + 1), axis=-1)
        v = jnp.asarray(self._kv, dtype=x.dtype)
        return y0 + (y1 - y0) * v

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        Hout = self.out_shape[0]
        if x.shape[-2] != self.Hin_pad:
            # padded input rows are never read (lat_idx + 1 <= Hin - 1)
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, self.Hin_pad - x.shape[-2]), (0, 0)])
        y = self._fn(x)
        return y[..., :Hout, :]


def make_resample(nlat_in, nlon_in, nlat_out, nlon_out, grid_in="equiangular", grid_out="equiangular", mode="bilinear") -> ResampleS2:
    """Serial ResampleS2, or the halo-exchange distributed one when a
    spatial mesh is active (MAKANI_RESAMPLE_HALO=0 falls back to the
    GSPMD-sharded matmul formulation)."""
    if mesh_mod.is_distributed("spatial"):
        if os.environ.get("MAKANI_RESAMPLE_HALO", "1") == "1":
            return DistributedResampleS2(nlat_in, nlon_in, nlat_out, nlon_out, grid_in=grid_in, grid_out=grid_out, mode=mode)
        return ResampleS2(nlat_in, nlon_in, nlat_out, nlon_out, grid_in=grid_in, grid_out=grid_out, mode=mode, method="matmul")
    return ResampleS2(nlat_in, nlon_in, nlat_out, nlon_out, grid_in=grid_in, grid_out=grid_out, mode=mode, method="auto")
