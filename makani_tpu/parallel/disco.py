"""Hand-scheduled distributed DISCO convolution (halo exchange).

The reference distributes DISCO with an explicit halo-exchange convolution
(``thd.DistributedDiscreteContinuousConvS2``, bound at
``makani/models/networks/fourcastnet3.py:189-205``). The GSPMD derivation
from shardings is parity-correct but materializes wide gathers of the
spatial axes; this module is the TPU-native equivalent of the reference's
hand path, built from the serial op's own psi tables:

  * **latitude (h)**: one bidirectional ``ppermute`` halo exchange of at
    most ``HU``/``HD`` rows (the maximum band reach across shard
    boundaries, precomputed from ``band_start``/``BL``),
  * **longitude (w)**: a circular ``ppermute`` halo of ``halo + stride``
    columns — the banded window's full reach — instead of a
    channel<->longitude all_to_all (works for any channel count, moves
    ~WW columns instead of the whole width). The phase-window offsets into
    the assembled strip are provably rank-independent (the phase-u origin
    of a shard's output block aligns with its input block),
  * the banded contraction itself is the serial op's per-latitude grouped
    conv on local rows with per-rank psi slices (selected by
    ``lax.axis_index``), so compute is identical to the single-chip path,
  * polar rows (full-longitude FFT correlation) all_gather just those few
    rows over w; per-h-rank row sets are padded to a uniform count with
    zero-psi dummies that scatter-add zero.

Uneven latitudes (721 = prime) are handled by padding the global array to
the mesh multiple inside ``__call__``; padded output rows carry zero psi.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from makani_tpu.ops.disco import DiscoConvS2
from makani_tpu.parallel import mesh as mesh_mod

__all__ = ["DistributedDiscoConvS2", "make_disco_conv"]


def _pad_up(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


class DistributedDiscoConvS2(DiscoConvS2):
    """DiscoConvS2 with shard_map halo-exchange execution over ("h", "w").

    Same global contract as the serial op: x (B, C, Hin, Win) ->
    t (B, C, K, Hout, Wout); the input may be sharded P(batch, None, h, w)
    and the output comes back sharded the same way.
    """

    # the fused weight path has its own halo shard_map body (``fused`` below):
    # the learned weights are pre-contracted with the per-rank psi slices
    # inside the body, so the grouped encoder/decoder contraction stays
    # entirely shard-local — without it GSPMD all-gathers the full-res
    # (B, C, K, H, W) responses to run the channel-mix einsum globally
    # (15.6 GB of all-gathers in the 0.25-deg FCN3 census, PERF.md round 4)
    supports_fused = True
    # the distributed __call__ runs its own shard_map body and has no
    # separated polar-rows variant; DiscoConv falls back to the combined t
    supports_split = False

    def __init__(self, *args, h_axis="h", w_axis="w", **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh_mod.get_mesh()
        self.h_axis, self.w_axis = h_axis, w_axis
        self.h_size = self.mesh.shape.get(h_axis, 1)
        self.w_size = self.mesh.shape.get(w_axis, 1)

        Hin, Win = self.in_shape
        Hout, Wout = self.out_shape
        h, w = self.h_size, self.w_size
        if Win % w or Wout % w:
            raise ValueError("distributed DISCO requires lon divisible by w")
        if (Wout // w) % self.phases:
            raise ValueError("distributed DISCO requires Wout/w divisible by the phase count")

        self.Hin_pad = _pad_up(Hin, h)
        self.Hout_pad = _pad_up(Hout, h)
        Hl_in, Hl_out = self.Hin_pad // h, self.Hout_pad // h

        # band_start for padded output rows: replicate the last real row (its
        # psi slice is zeroed, so only the halo bookkeeping sees it)
        bs = np.concatenate([self.band_start, np.full(self.Hout_pad - Hout, self.band_start[Hout - 1], np.int32)])
        BL = self.BL

        # latitude halo needs per rank
        need_lo = np.zeros(h, np.int64)
        need_hi = np.zeros(h, np.int64)
        for r in range(h):
            rows = bs[r * Hl_out : (r + 1) * Hl_out]
            need_lo[r] = r * Hl_in - rows.min()
            need_hi[r] = (rows.max() + BL) - (r + 1) * Hl_in
        self.HU = int(max(need_lo.max(), 0))
        self.HD = int(max(need_hi.max(), 0))
        if self.HU > Hl_in or self.HD > Hl_in:
            raise ValueError(
                f"lat halo ({self.HU}/{self.HD}) exceeds the local block ({Hl_in}); lower h for this resolution"
            )

        # longitude halo: the window reach plus stride alignment margin. When
        # the reach exceeds one neighbor's width (only tiny test grids), fall
        # back to a full-longitude all_gather with a rank-dependent window.
        Wl_in = Win // w
        self._wide_lon = w > 1 and (self.halo + self.stride > Wl_in)
        self.HL = 0 if (w == 1 or self._wide_lon) else self.halo + self.stride

        # local band indices into the assembled (HU + Hl_in + HD) lat block
        lb = np.zeros((h, Hl_out, BL), np.int32)
        for r in range(h):
            rows = bs[r * Hl_out : (r + 1) * Hl_out]
            lb[r] = rows[:, None] + np.arange(BL)[None, :] - (r * Hl_in - self.HU)
        self._local_band = lb

        # per-rank psi slices, zero-padded in latitude
        K = self.K
        psib = np.zeros((self.phases, K, self.Hout_pad, BL, self.WW), np.float32)
        psib[:, :, :Hout] = self.psi_band
        self._psi_band_r = np.stack(
            [psib[:, :, r * Hl_out : (r + 1) * Hl_out] for r in range(h)]
        )  # (h, b, K, Hl_out, BL, WW)

        # per-h-rank polar-row sets, padded to a uniform count with zero-psi
        # dummies at local row 0 (scatter-ADD makes them no-ops)
        per_rank = [
            [ro - r * Hl_out for ro in self.polar_rows if r * Hl_out <= ro < (r + 1) * Hl_out] for r in range(h)
        ]
        self.P_max = max((len(p) for p in per_rank), default=0)
        if self.P_max:
            rows_r = np.zeros((h, self.P_max), np.int32)
            psip_r = np.zeros((h, self.phases, K, self.P_max, BL, Win), np.float32)
            for r, prow in enumerate(per_rank):
                for i, ro_loc in enumerate(prow):
                    rows_r[r, i] = ro_loc
                    gi = self.polar_rows.index(ro_loc + r * Hl_out)
                    psip_r[r, :, :, i] = self.psi_polar[:, :, gi]
            self._polar_rows_r = rows_r
            self._psi_polar_r = psip_r

        self._fn = jax.shard_map(
            self._body,
            mesh=self.mesh,
            in_specs=(P(("batch", "ensemble"), None, self.h_axis, self.w_axis),),
            out_specs=P(("batch", "ensemble"), None, None, self.h_axis, self.w_axis),
            check_vma=False,
        )
        self._Hl_in, self._Hl_out = Hl_in, Hl_out

    def _body(self, x):
        """x local: (B, C, Hl_in, Wl_in) -> t local (B, C, K, Hl_out, Wl_out)."""
        h, w = self.h_size, self.w_size
        Hin, Win = self.in_shape
        Hout, Wout = self.out_shape
        K, BL, halo = self.K, self.BL, self.halo
        a, b = self.stride, self.phases
        HU, HD, HL = self.HU, self.HD, self.HL
        Hl_out = self._Hl_out
        Wl_in = Win // w
        Wl_out = Wout // w
        B, C = x.shape[0], x.shape[1]

        # latitude halo exchange: non-received edges zero-fill, and the band
        # indices provably never touch them (band_start stays within the grid)
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

        rank = lax.axis_index(self.h_axis)
        lb = jnp.take(jnp.asarray(self._local_band), rank, axis=0)  # (Hl_out, BL)
        psi_band = jnp.take(jnp.asarray(self._psi_band_r), rank, axis=0)  # (b, K, Hl_out, BL, WW)

        xb = blk[:, :, lb.reshape(-1), :].reshape(B, C, Hl_out, BL, Wl_in)

        # circular longitude halo: the phase windows for a shard's output
        # block start at base_p - halo relative to its own input block, so a
        # (halo + stride)-column halo on each side covers every window
        wrank = lax.axis_index(self.w_axis) if w > 1 else 0
        if w > 1 and not self._wide_lon:
            widx = np.arange(w)
            left = lax.ppermute(xb[..., -HL:], self.w_axis, perm=[(q, (q + 1) % w) for q in widx])
            right = lax.ppermute(xb[..., :HL], self.w_axis, perm=[((q + 1) % w, q) for q in widx])
            strip = jnp.concatenate([left, xb, right], axis=-1)  # (B, C, Hl_out, BL, HL+Wl_in+HL)
        elif self._wide_lon:
            strip = lax.all_gather(xb, self.w_axis, axis=-1, tiled=True)  # full Win
        else:
            strip = xb

        if self.P_max:
            prow = jnp.take(jnp.asarray(self._polar_rows_r), rank, axis=0)  # (P_max,)
            psi_polar = jnp.take(jnp.asarray(self._psi_polar_r), rank, axis=0)  # (b, K, P_max, BL, Win)
            xb_p = jnp.take(xb, prow, axis=2)  # (B, C, P_max, BL, Wl_in)
            if w > 1:
                xb_p = lax.all_gather(xb_p, self.w_axis, axis=4, tiled=True)  # full lon

        n_u = Wl_out // b  # output columns per phase on this shard
        phase_outputs = []
        for p in range(b):
            base = int(self.bases[p])
            # window origin for local u=0 sits at column base - halo of the
            # local input block -> offset HL + base - halo into the strip
            # (rank-independent; wraparound supplied by the circular halo)
            span = (n_u - 1) * a + self.WW
            if w > 1 and not self._wide_lon:
                off = HL + base - halo
                xs = lax.dynamic_slice_in_dim(strip, off, span, axis=-1)
            elif self._wide_lon:
                # full-lon fallback: window origin is rank-dependent
                xs = jnp.roll(strip, -(wrank * Wl_in + base - halo), axis=-1)
                if span > Win:
                    xs = jnp.concatenate([xs, xs[..., : span - Win]], axis=-1)
                else:
                    xs = xs[..., :span]
            else:
                xs = jnp.roll(strip, -(base - halo), axis=-1)
                if span > Wl_in:
                    xs = jnp.concatenate([xs, xs[..., : span - Wl_in]], axis=-1)
                else:
                    xs = xs[..., :span]
            inp = xs.reshape(B * C, Hl_out * BL, xs.shape[-1]).astype(jnp.float32)
            filt = jnp.transpose(psi_band[p], (1, 0, 2, 3)).reshape(Hl_out * K, BL, self.WW)
            out = lax.conv_general_dilated(
                inp,
                filt,
                window_strides=(a,),
                padding="VALID",
                dimension_numbers=("NCW", "OIW", "NCW"),
                feature_group_count=Hl_out,
            )  # (B*C, Hl_out*K, n_u)
            t_p = out.reshape(B, C, Hl_out, K, n_u).transpose(0, 1, 3, 2, 4)

            if self.P_max:
                from makani_tpu.ops import fft_compat

                Xs = fft_compat.rfft_s(xb_p.astype(jnp.float32), axis=-1)
                psi_p = jnp.roll(psi_polar[p], base, axis=-1)
                Ps = fft_compat.rfft_s(psi_p, axis=-1)  # (K, P_max, BL, M, 2)
                re = jnp.einsum("bcpjm,kpjm->bckpm", Xs[..., 0], Ps[..., 0]) + jnp.einsum(
                    "bcpjm,kpjm->bckpm", Xs[..., 1], Ps[..., 1]
                )
                im = jnp.einsum("bcpjm,kpjm->bckpm", Xs[..., 1], Ps[..., 0]) - jnp.einsum(
                    "bcpjm,kpjm->bckpm", Xs[..., 0], Ps[..., 1]
                )
                corr = fft_compat.irfft_s(jnp.stack([re, im], axis=-1), n=Win, axis=-1, norm="backward")
                # this shard's u-range for phase p starts at u0 = wrank * n_u
                cols = (wrank * n_u + jnp.arange(n_u)) * a % Win
                t_pp = jnp.take(corr, cols, axis=-1)
                # banded psi is zeroed at polar rows, so add is exact; dummy
                # entries add zero (their psi slice is zero)
                t_p = t_p.at[:, :, :, prow, :].add(t_pp)
            phase_outputs.append(t_p)

        # interleave phases: local output column wo = p + b*u (Wl_out % b == 0
        # keeps every shard's interleave aligned with the serial op)
        t = jnp.stack(phase_outputs, axis=-1).reshape(B, C, K, Hl_out, Wl_out)
        return t

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        Hout = self.out_shape[0]
        if x.shape[-2] != self.Hin_pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, self.Hin_pad - x.shape[-2]), (0, 0)])
        t = self._fn(x)
        return t[..., :Hout, :]

    def _fused_body(self, xl, w):
        """Weight-fused halo body: xl local (B, g*ig, Hl_in, Wl_in), w
        replicated (g, og, ig, K) -> y local (B, g*og, Hl_out, Wl_out).

        Mirrors the serial ``DiscoConvS2._fused_window`` on the halo-assembled
        local band: the per-rank psi slice is pre-contracted with the learned
        weights, so the (B, C, K, H, W) responses never exist and no
        cross-shard contraction is needed — outputs stay sharded like inputs.
        """
        hs, ws = self.h_size, self.w_size
        Hin, Win = self.in_shape
        Hout, Wout = self.out_shape
        BL, halo = self.BL, self.halo
        a, b = self.stride, self.phases
        HU, HD, HL = self.HU, self.HD, self.HL
        Hl_out = self._Hl_out
        Wl_in = Win // ws
        Wl_out = Wout // ws
        B = xl.shape[0]
        g, og, ig, K = w.shape
        cdt = self.compute_dtype

        # latitude halo exchange (identical to _body)
        idx = np.arange(hs)
        if hs > 1 and HU > 0:
            top = lax.ppermute(xl[:, :, -HU:, :], self.h_axis, perm=list(zip(idx[:-1], idx[1:])))
        else:
            top = jnp.zeros((B, g * ig, HU, xl.shape[-1]), xl.dtype)
        if hs > 1 and HD > 0:
            bot = lax.ppermute(xl[:, :, :HD, :], self.h_axis, perm=list(zip(idx[1:], idx[:-1])))
        else:
            bot = jnp.zeros((B, g * ig, HD, xl.shape[-1]), xl.dtype)
        blk = jnp.concatenate([top, xl, bot], axis=2) if (HU or HD) else xl

        rank = lax.axis_index(self.h_axis)
        lb = jnp.take(jnp.asarray(self._local_band), rank, axis=0)  # (Hl_out, BL)
        psi_band = jnp.take(jnp.asarray(self._psi_band_r), rank, axis=0)  # (b, K, Hl_out, BL, WW)

        xb = blk.reshape(B, g, ig, blk.shape[2], Wl_in)[:, :, :, lb.reshape(-1), :]
        xb = xb.reshape(B, g, ig, Hl_out, BL, Wl_in)
        xb = jnp.transpose(xb, (0, 3, 1, 2, 4, 5))  # (B, Hl_out, g, ig, BL, Wl_in)

        # circular longitude halo (identical offsets to _body)
        wrank = lax.axis_index(self.w_axis) if ws > 1 else 0
        if ws > 1 and not self._wide_lon:
            widx = np.arange(ws)
            left = lax.ppermute(xb[..., -HL:], self.w_axis, perm=[(q, (q + 1) % ws) for q in widx])
            right = lax.ppermute(xb[..., :HL], self.w_axis, perm=[((q + 1) % ws, q) for q in widx])
            strip = jnp.concatenate([left, xb, right], axis=-1)
        elif self._wide_lon:
            strip = lax.all_gather(xb, self.w_axis, axis=-1, tiled=True)  # full Win
        else:
            strip = xb

        if self.P_max:
            prow = jnp.take(jnp.asarray(self._polar_rows_r), rank, axis=0)  # (P_max,)
            psi_polar = jnp.take(jnp.asarray(self._psi_polar_r), rank, axis=0)  # (b, K, P_max, BL, Win)
            xb_p = jnp.take(xb, prow, axis=1)  # (B, P_max, g, ig, BL, Wl_in)
            if ws > 1:
                xb_p = lax.all_gather(xb_p, self.w_axis, axis=-1, tiled=True)  # full lon

        n_u = Wl_out // b
        phase_outputs = []
        for p in range(b):
            base = int(self.bases[p])
            span = (n_u - 1) * a + self.WW
            if ws > 1 and not self._wide_lon:
                off = HL + base - halo
                xs = lax.dynamic_slice_in_dim(strip, off, span, axis=-1)
            elif self._wide_lon:
                xs = jnp.roll(strip, -(wrank * Wl_in + base - halo), axis=-1)
                if span > Win:
                    xs = jnp.concatenate([xs, xs[..., : span - Win]], axis=-1)
                else:
                    xs = xs[..., :span]
            else:
                xs = jnp.roll(strip, -(base - halo), axis=-1)
                if span > Wl_in:
                    xs = jnp.concatenate([xs, xs[..., : span - Wl_in]], axis=-1)
                else:
                    xs = xs[..., :span]
            inp = xs.reshape(B, Hl_out * g * ig * BL, span).astype(cdt)
            filt = jnp.einsum("goik,khjw->hgoijw", w.astype(jnp.float32), psi_band[p])
            filt = filt.reshape(Hl_out * g * og, ig * BL, self.WW).astype(cdt)
            out = lax.conv_general_dilated(
                inp,
                filt,
                window_strides=(a,),
                padding="VALID",
                dimension_numbers=("NCW", "OIW", "NCW"),
                feature_group_count=Hl_out * g,
            )  # (B, Hl_out*g*og, n_u)
            y_p = out.reshape(B, Hl_out, g * og, n_u).transpose(0, 2, 1, 3)  # (B, Cout, Hl_out, n_u)

            if self.P_max:
                from makani_tpu.ops import fft_compat

                # FFT circular-correlation responses on the few local polar
                # rows (always fp32, like _body), then the tiny w contraction
                Xs = fft_compat.rfft_s(xb_p.astype(jnp.float32), axis=-1)
                psi_p = jnp.roll(psi_polar[p], base, axis=-1)
                Ps = fft_compat.rfft_s(psi_p, axis=-1)  # (K, P_max, BL, M, 2)
                re = jnp.einsum("bpgijm,kpjm->bpgikm", Xs[..., 0], Ps[..., 0]) + jnp.einsum(
                    "bpgijm,kpjm->bpgikm", Xs[..., 1], Ps[..., 1]
                )
                im = jnp.einsum("bpgijm,kpjm->bpgikm", Xs[..., 1], Ps[..., 0]) - jnp.einsum(
                    "bpgijm,kpjm->bpgikm", Xs[..., 0], Ps[..., 1]
                )
                corr = fft_compat.irfft_s(jnp.stack([re, im], axis=-1), n=Win, axis=-1, norm="backward")
                cols = (wrank * n_u + jnp.arange(n_u)) * a % Win
                t_pp = jnp.take(corr, cols, axis=-1)  # (B, P_max, g, ig, K, n_u)
                y_pp = jnp.einsum("bpgiku,goik->bgopu", t_pp, w.astype(jnp.float32))
                y_pp = y_pp.reshape(B, g * og, self.P_max, n_u)
                # banded psi is zeroed at polar rows (same invariant _body
                # relies on), so a scatter-add of the exact rows is exact
                y_p = y_p.at[:, :, prow, :].add(y_pp.astype(y_p.dtype))
            phase_outputs.append(y_p)

        y = jnp.stack(phase_outputs, axis=-1).reshape(B, g * og, Hl_out, Wl_out)
        return y

    def fused(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """Distributed weight-fused DISCO conv: x (B, g*ig, Hin, Win) sharded
        over (h, w), w (g, og, ig, K) replicated -> y (B, g*og, Hout, Wout)
        sharded like x."""
        Hout = self.out_shape[0]
        if x.shape[-2] != self.Hin_pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, self.Hin_pad - x.shape[-2]), (0, 0)])
        if not hasattr(self, "_fused_fn"):
            self._fused_fn = jax.shard_map(
                self._fused_body,
                mesh=self.mesh,
                in_specs=(P(("batch", "ensemble"), None, self.h_axis, self.w_axis), P()),
                out_specs=P(("batch", "ensemble"), None, self.h_axis, self.w_axis),
                check_vma=False,
            )
        y = self._fused_fn(x, w)
        return y[..., :Hout, :]


def make_disco_conv(in_shape, out_shape, kernel_shape=(3, 4), **kwargs) -> DiscoConvS2:
    """Serial DiscoConvS2, or the halo-exchange distributed one when a
    spatial mesh is active (MAKANI_DISCO_HALO=0 falls back to GSPMD)."""
    if mesh_mod.is_distributed("spatial") and os.environ.get("MAKANI_DISCO_HALO", "1") == "1":
        return DistributedDiscoConvS2(in_shape, out_shape, kernel_shape, **kwargs)
    return DiscoConvS2(in_shape, out_shape, kernel_shape, **kwargs)
