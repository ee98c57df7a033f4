"""Pangu-Weather — flax.linen.

Re-implementation of the reference Pangu
(``makani/models/networks/pangu.py:339-1158``; Bi et al., arXiv:2211.02556):
a 3D earth-specific transformer. The flat channel stack is split into surface
(+aux) and atmospheric (variables x pressure levels) groups, patch-embedded
in 2D/3D, fused into one (Pl, Lat, Lon) token volume, processed by
shifted-window 3D attention layers in an encoder-decoder arrangement with a
skip between the two resolutions, and recovered into patches.

Earth-specific attention bias: on a lat-lon grid the relation between two
cells depends on their *absolute* latitude and pressure level, so the bias
table is indexed by absolute (i, j) pairs along pl/lat and relative offsets
along lon, with one table slice per (pl, lat) window position
(ref pangu.py:339-587).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.common.layers import DropPath
from makani_tpu.utils.features import get_channel_groups

__all__ = ["EarthAttention3D", "Transformer3DBlock", "FuserLayer", "Pangu"]

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


# ---------------------------------------------------------------------------
# static helpers (numpy; ref pangu.py:40-250)
# ---------------------------------------------------------------------------


def get_earth_position_index(window_size) -> np.ndarray:
    """Bias-table index (N, N): absolute pairs along pl/lat, relative lon."""
    wpl, wlat, wlon = window_size
    zi = np.arange(wpl)
    zj = -np.arange(wpl) * wpl
    hi = np.arange(wlat)
    hj = -np.arange(wlat) * wlat
    wi = np.arange(wlon)

    c_i = np.stack(np.meshgrid(zi, hi, wi, indexing="ij")).reshape(3, -1)  # query side
    c_j = np.stack(np.meshgrid(zj, hj, wi, indexing="ij")).reshape(3, -1)  # key side

    coords = c_i[:, :, None] + c_j[:, None, :]  # pl/lat: absolute pair codes; lon: wi + wj
    # recompute lon as a relative offset
    lon_rel = c_i[2][:, None] - c_i[2][None, :]

    pl_code = coords[0] + (wpl - 1) * wpl  # [0, wpl^2)
    lat_code = coords[1] + (wlat - 1) * wlat  # [0, wlat^2)
    lon_code = lon_rel + (wlon - 1)  # [0, 2*wlon-1)

    index = pl_code * (wlat * wlat * (2 * wlon - 1)) + lat_code * (2 * wlon - 1) + lon_code
    return index.astype(np.int64)


def get_pad3d(input_resolution, window_size):
    """(front, back, top, bottom, left, right) zero padding per dim."""
    pl, lat, lon = input_resolution
    wpl, wlat, wlon = window_size
    pads = []
    for n, w in ((pl, wpl), (lat, wlat), (lon, wlon)):
        r = n % w
        p = (w - r) % w
        pads.append((p // 2, p - p // 2))
    return pads  # [(front, back), (top, bottom), (left, right)]


def get_shift_window_mask(pad_resolution, window_size, shift_size) -> np.ndarray:
    """Swin-style additive mask for shifted windows:
    (num_lon, num_pl*num_lat, N, N) with 0 valid / -1e4 invalid."""
    pl, lat, lon = pad_resolution
    wpl, wlat, wlon = window_size
    spl, slat, slon = shift_size

    img = np.zeros((pl, lat, lon))
    cnt = 0
    for s0 in (slice(0, -wpl), slice(-wpl, -spl), slice(-spl, None)):
        for s1 in (slice(0, -wlat), slice(-wlat, -slat), slice(-slat, None)):
            for s2 in (slice(0, -wlon), slice(-wlon, -slon), slice(-slon, None)):
                img[s0, s1, s2] = cnt
                cnt += 1

    # partition into windows: (num_pl, wpl, num_lat, wlat, num_lon, wlon)
    npl, nlat, nlon = pl // wpl, lat // wlat, lon // wlon
    win = img.reshape(npl, wpl, nlat, wlat, nlon, wlon)
    win = win.transpose(4, 0, 2, 1, 3, 5).reshape(nlon, npl * nlat, wpl * wlat * wlon)
    diff = win[:, :, :, None] - win[:, :, None, :]
    return np.where(diff != 0, -10000.0, 0.0).astype(np.float32)


def window_partition(x, window_size):
    """(B, Pl, Lat, Lon, C) -> (B*num_lon, num_pl*num_lat, N, C)."""
    B, Pl, Lat, Lon, C = x.shape
    wpl, wlat, wlon = window_size
    npl, nlat, nlon = Pl // wpl, Lat // wlat, Lon // wlon
    x = x.reshape(B, npl, wpl, nlat, wlat, nlon, wlon, C)
    x = jnp.transpose(x, (0, 5, 1, 3, 2, 4, 6, 7))  # B, nlon, npl, nlat, wpl, wlat, wlon, C
    return x.reshape(B * nlon, npl * nlat, wpl * wlat * wlon, C)


def window_reverse(windows, window_size, B, Pl, Lat, Lon):
    wpl, wlat, wlon = window_size
    npl, nlat, nlon = Pl // wpl, Lat // wlat, Lon // wlon
    x = windows.reshape(B, nlon, npl, nlat, wpl, wlat, wlon, -1)
    x = jnp.transpose(x, (0, 2, 4, 3, 5, 1, 6, 7))
    return x.reshape(B, Pl, Lat, Lon, x.shape[-1])


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


class EarthAttention3D(nn.Module):
    dim: int
    input_resolution: Tuple[int, int, int]  # padded
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        # x: (B*num_lon, nW_, N, C)
        B_, nW_, N, C = x.shape
        H = self.num_heads
        hd = C // H
        wpl, wlat, wlon = self.window_size
        type_of_windows = (self.input_resolution[0] // wpl) * (self.input_resolution[1] // wlat)

        table = self.param(
            "earth_position_bias_table",
            _trunc02,
            ((wpl**2) * (wlat**2) * (2 * wlon - 1), type_of_windows, H),
            jnp.float32,
        )
        idx = get_earth_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(N, N, type_of_windows, H)
        bias = jnp.transpose(bias, (3, 2, 0, 1))  # (H, nW_, N, N)

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, kernel_init=_trunc02, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B_, nW_, N, 3, H, hd)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]  # (B_, nW_, N, H, hd)

        attn = jnp.einsum("bwnhd,bwmhd->bhwnm", q, k) / jnp.sqrt(hd).astype(x.dtype)
        attn = attn + bias.astype(attn.dtype)[None]
        if mask is not None:
            nLon = mask.shape[0]
            attn = attn.reshape(B_ // nLon, nLon, H, nW_, N, N) + jnp.asarray(mask, attn.dtype)[None, :, None]
            attn = attn.reshape(B_, H, nW_, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        if self.attn_drop_rate > 0:
            attn = nn.Dropout(self.attn_drop_rate)(attn, deterministic=deterministic)

        y = jnp.einsum("bhwnm,bwmhd->bwnhd", attn, v).reshape(B_, nW_, N, C)
        y = nn.Dense(C, kernel_init=_trunc02, dtype=self.dtype, name="proj")(y)
        if self.proj_drop_rate > 0:
            y = nn.Dropout(self.proj_drop_rate)(y, deterministic=deterministic)
        return y


class Transformer3DBlock(nn.Module):
    dim: int
    input_resolution: Tuple[int, int, int]
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 6, 12)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        Pl, Lat, Lon = self.input_resolution
        B, L, C = x.shape
        ws = tuple(self.window_size)
        ss = tuple(self.shift_size)

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = x.reshape(B, Pl, Lat, Lon, C)

        pads = get_pad3d((Pl, Lat, Lon), ws)
        x = jnp.pad(x, [(0, 0)] + [list(p) for p in pads] + [(0, 0)])
        _, Pl_p, Lat_p, Lon_p, _ = x.shape

        roll = all(s > 0 for s in ss)
        if roll:
            x = jnp.roll(x, shift=(-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
            mask = get_shift_window_mask((Pl_p, Lat_p, Lon_p), ws, ss)
        else:
            mask = None

        windows = window_partition(x, ws)
        attn_windows = EarthAttention3D(
            self.dim,
            (Pl_p, Lat_p, Lon_p),
            ws,
            self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop_rate=self.attn_drop_rate,
            proj_drop_rate=self.drop_rate,
            dtype=self.dtype,
            name="attn",
        )(windows, mask=mask, deterministic=deterministic)

        x = window_reverse(attn_windows, ws, B, Pl_p, Lat_p, Lon_p)
        if roll:
            x = jnp.roll(x, shift=ss, axis=(1, 2, 3))

        x = x[:, pads[0][0] : Pl_p - pads[0][1], pads[1][0] : Lat_p - pads[1][1], pads[2][0] : Lon_p - pads[2][1], :]
        x = x.reshape(B, L, C)

        if self.drop_path > 0:
            x = DropPath(self.drop_path)(x, deterministic=deterministic)
        x = shortcut + x

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Dense(int(C * self.mlp_ratio), kernel_init=_trunc02, dtype=self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        if self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate)(h, deterministic=deterministic)
        h = nn.Dense(C, kernel_init=_trunc02, dtype=self.dtype)(h)
        if self.drop_path > 0:
            h = DropPath(self.drop_path)(h, deterministic=deterministic)
        return x + h


class FuserLayer(nn.Module):
    dim: int
    input_resolution: Tuple[int, int, int]
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int]
    mlp_ratio: float = 4.0
    drop_path: Sequence[float] = (0.0,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else self.drop_path[-1]
            x = Transformer3DBlock(
                self.dim,
                self.input_resolution,
                self.num_heads,
                window_size=tuple(self.window_size),
                shift_size=tuple(0 if i % 2 == 0 else w // 2 for w in self.window_size),
                drop_path=float(dp),
                dtype=self.dtype,
                name=f"block{i}",
            )(x, deterministic=deterministic)
        return x


class _PatchEmbed3D(nn.Module):
    patch_size: Tuple[int, int, int]
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, C, Pl, Lat, Lon); pad each dim up to a patch multiple
        B, C, Pl, Lat, Lon = x.shape
        pp, ph, pw = self.patch_size
        pads = [((-d) % p) for d, p in ((Pl, pp), (Lat, ph), (Lon, pw))]
        x = jnp.pad(x, [(0, 0), (0, 0), (0, pads[0]), (0, pads[1]), (0, pads[2])])
        gp, gh, gw = (Pl + pads[0]) // pp, (Lat + pads[1]) // ph, (Lon + pads[2]) // pw
        x = x.reshape(B, C, gp, pp, gh, ph, gw, pw)
        x = jnp.transpose(x, (0, 2, 4, 6, 1, 3, 5, 7)).reshape(B, gp, gh, gw, C * pp * ph * pw)
        y = nn.Dense(self.embed_dim, kernel_init=_trunc02, dtype=self.dtype)(x)
        return jnp.transpose(y, (0, 4, 1, 2, 3))  # (B, E, gp, gh, gw)


class _PatchRecovery3D(nn.Module):
    img_size: Tuple[int, int, int]
    patch_size: Tuple[int, int, int]
    out_chans: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, E, gp, gh, gw)
        B, E, gp, gh, gw = x.shape
        pp, ph, pw = self.patch_size
        y = jnp.transpose(x, (0, 2, 3, 4, 1))
        y = nn.Dense(self.out_chans * pp * ph * pw, kernel_init=_trunc02, dtype=self.dtype)(y)
        y = y.reshape(B, gp, gh, gw, self.out_chans, pp, ph, pw)
        y = jnp.transpose(y, (0, 4, 1, 5, 2, 6, 3, 7)).reshape(B, self.out_chans, gp * pp, gh * ph, gw * pw)
        # center-crop the padding back off
        Pl, Lat, Lon = self.img_size
        sp, sh, sw = (gp * pp - Pl), (gh * ph - Lat), (gw * pw - Lon)
        return y[:, :, sp // 2 : gp * pp - (sp - sp // 2), sh // 2 : gh * ph - (sh - sh // 2), sw // 2 : gw * pw - (sw - sw // 2)]


class _DownSample3D(nn.Module):
    """2x2 lat-lon patch merging (ref common/layers.py:1156-1232)."""

    out_dim: int
    input_resolution: Tuple[int, int, int]
    output_resolution: Tuple[int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        Pl, Lat, Lon = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, Pl, Lat, Lon, C)
        pad_lat = (-Lat) % 2
        pad_lon = (-Lon) % 2
        x = jnp.pad(x, [(0, 0), (0, 0), (0, pad_lat), (0, pad_lon), (0, 0)])
        H2, W2 = (Lat + pad_lat) // 2, (Lon + pad_lon) // 2
        x = x.reshape(B, Pl, H2, 2, W2, 2, C)
        x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6)).reshape(B, Pl, H2, W2, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Dense(self.out_dim, use_bias=False, kernel_init=_trunc02, dtype=self.dtype)(x)
        oPl, oLat, oLon = self.output_resolution
        x = x[:, :oPl, :oLat, :oLon]
        return x.reshape(B, -1, self.out_dim)


class _UpSample3D(nn.Module):
    """2x2 lat-lon pixel-shuffle upsampling (ref common/layers.py:1074-1154)."""

    out_dim: int
    input_resolution: Tuple[int, int, int]
    output_resolution: Tuple[int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        Pl, Lat, Lon = self.input_resolution
        B, L, C = x.shape
        x = nn.Dense(self.out_dim * 4, use_bias=False, kernel_init=_trunc02, dtype=self.dtype)(x)
        x = x.reshape(B, Pl, Lat, Lon, 2, 2, self.out_dim)
        x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6)).reshape(B, Pl, Lat * 2, Lon * 2, self.out_dim)
        oPl, oLat, oLon = self.output_resolution
        # center crop
        sh, sw = Lat * 2 - oLat, Lon * 2 - oLon
        x = x[:, :oPl, sh // 2 : Lat * 2 - (sh - sh // 2), sw // 2 : Lon * 2 - (sw - sw // 2), :]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Dense(self.out_dim, use_bias=False, kernel_init=_trunc02, dtype=self.dtype)(x)
        return x.reshape(B, -1, self.out_dim)


class Pangu(nn.Module):
    """Pangu-Weather (ref pangu.py:836-1158)."""

    inp_shape: Tuple[int, int] = (721, 1440)
    out_shape: Tuple[int, int] = (721, 1440)
    inp_chans: int = 5
    out_chans: int = 5
    patch_size: Tuple[int, int, int] = (2, 8, 8)
    embed_dim: int = 8
    depth_layers: Tuple[int, int, int, int] = (1, 1, 1, 1)
    num_heads: Tuple[int, int, int, int] = (1, 1, 1, 1)
    window_size: Tuple[int, int, int] = (2, 6, 12)
    channel_names: Sequence[str] = ("u10m", "t2m", "u500", "z500", "t500")
    aux_channel_names: Sequence[str] = ()
    path_drop_rate: float = 0.0
    checkpointing_level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        names = list(self.channel_names)
        aux_names = list(self.aux_channel_names)
        atmo_chans, surf_chans, dyn_aux, stat_aux, plvls = get_channel_groups(names, aux_names)
        aux_chans = list(dyn_aux) + list(stat_aux)
        n_groups = len(plvls)
        n_atmo = len(atmo_chans) // max(n_groups, 1)
        num_levels = n_groups
        has_surface = (len(surf_chans) + len(aux_chans)) > 0

        B = x.shape[0]
        H, W = self.inp_shape
        pp, ph, pw = self.patch_size
        E = self.embed_dim

        # split surface(+aux) and atmospheric (vars x levels)
        surf = x[:, np.asarray(list(surf_chans) + aux_chans)] if has_surface else None
        # atmo layout (B, vars, levels, H, W): atmo_chans is level-major
        atmo = x[:, np.asarray(atmo_chans)].reshape(B, n_groups, n_atmo, H, W)
        atmo = jnp.transpose(atmo, (0, 2, 1, 3, 4))  # (B, vars, levels, H, W)

        emb3d = _PatchEmbed3D(self.patch_size, E, dtype=self.dtype, name="patchembed3d")(atmo)
        if has_surface:
            surf5 = surf[:, :, None]  # (B, Csurf, 1, H, W)
            emb2d = _PatchEmbed3D((1, ph, pw), E, dtype=self.dtype, name="patchembed2d")(surf5)
            z = jnp.concatenate([emb2d, emb3d], axis=2)
        else:
            z = emb3d

        _, _, gp, gh, gw = z.shape
        res1 = (gp, gh, gw)
        z = z.reshape(B, E, -1)
        z = jnp.transpose(z, (0, 2, 1))  # (B, L, E)

        dp = np.linspace(0, self.path_drop_rate, 8).tolist()
        depth_layers = self.depth_layers if isinstance(self.depth_layers, (tuple, list)) else (self.depth_layers,) * 4
        num_heads = self.num_heads if isinstance(self.num_heads, (tuple, list)) else (self.num_heads,) * 4

        z = FuserLayer(E, res1, depth_layers[0], num_heads[0], self.window_size, drop_path=dp[:2], dtype=self.dtype, name="layer1")(z, deterministic=deterministic)
        skip = z

        res2 = (gp, math.ceil(gh / 2), math.ceil(gw / 2))
        z = _DownSample3D(E * 2, res1, res2, dtype=self.dtype, name="downsample")(z)
        z = FuserLayer(E * 2, res2, depth_layers[1], num_heads[1], self.window_size, drop_path=dp[2:], dtype=self.dtype, name="layer2")(z, deterministic=deterministic)
        z = FuserLayer(E * 2, res2, depth_layers[2], num_heads[2], self.window_size, drop_path=dp[2:], dtype=self.dtype, name="layer3")(z, deterministic=deterministic)
        z = _UpSample3D(E, res2, res1, dtype=self.dtype, name="upsample")(z)
        z = FuserLayer(E, res1, depth_layers[3], num_heads[3], self.window_size, drop_path=dp[:2], dtype=self.dtype, name="layer4")(z, deterministic=deterministic)

        z = jnp.concatenate([z, skip], axis=-1)  # (B, L, 2E)
        z = jnp.transpose(z, (0, 2, 1)).reshape(B, 2 * E, gp, gh, gw)

        out = jnp.zeros((B, len(names), H, W), x.dtype)
        if has_surface:
            zs = z[:, :, 0]  # (B, 2E, gh, gw)
            ys = _PatchRecovery3D((1, H, W), (1, ph, pw), len(surf_chans), dtype=self.dtype, name="patchrecovery2d")(zs[:, :, None])
            out = out.at[:, np.asarray(surf_chans)].set(ys[:, :, 0])
            za = z[:, :, 1:]
        else:
            za = z
        ya = _PatchRecovery3D((num_levels, H, W), self.patch_size, n_atmo, dtype=self.dtype, name="patchrecovery3d")(za)
        # (B, vars, levels, H, W) -> level-major channel order
        ya = jnp.transpose(ya, (0, 2, 1, 3, 4)).reshape(B, n_groups * n_atmo, H, W)
        out = out.at[:, np.asarray(atmo_chans)].set(ya)
        return out
