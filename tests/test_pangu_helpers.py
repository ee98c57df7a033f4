"""Pangu earth-attention static helpers vs brute force (ref pangu.py:40-250):
the earth position index must be a bijection of (abs pl pair, abs lat pair,
rel lon offset), padding must restore divisibility, and the shifted-window
mask must block exactly the cross-boundary pairs."""

import numpy as np
import pytest

from makani_tpu.models.networks.pangu import (
    get_earth_position_index,
    get_pad3d,
    get_shift_window_mask,
)


def test_earth_position_index_semantics():
    """index[i, j] must depend exactly on (pl_i, pl_j), (lat_i, lat_j), and
    lon_i - lon_j — absolute pairs along pl/lat (earth-specific bias),
    relative along lon (translation invariance)."""
    wpl, wlat, wlon = 2, 3, 4
    idx = get_earth_position_index((wpl, wlat, wlon))
    N = wpl * wlat * wlon
    assert idx.shape == (N, N)
    assert idx.min() >= 0 and idx.max() < wpl * wpl * wlat * wlat * (2 * wlon - 1)

    def unflatten(t):
        return t // (wlat * wlon), (t // wlon) % wlat, t % wlon

    seen = {}
    for i in range(N):
        for j in range(N):
            pi, hi, wi = unflatten(i)
            pj, hj, wj = unflatten(j)
            key = (pi, pj, hi, hj, wi - wj)
            if key in seen:
                assert seen[key] == idx[i, j], (key, seen[key], idx[i, j])
            else:
                seen[key] = idx[i, j]
    # bijection: distinct keys map to distinct table rows
    assert len(set(seen.values())) == len(seen)


def test_pad3d_restores_divisibility():
    pads = get_pad3d((5, 7, 9), (2, 3, 4))
    for (n, w), (lo, hi) in zip(((5, 2), (7, 3), (9, 4)), pads):
        assert (n + lo + hi) % w == 0
        assert 0 <= hi - lo <= 1  # balanced padding
    # already divisible -> no padding
    assert get_pad3d((4, 6, 8), (2, 3, 4)) == [(0, 0), (0, 0), (0, 0)]


def test_shift_window_mask_blocks_cross_boundary_pairs():
    """Tokens from different pre-shift regions within a rolled window must be
    masked (-1e4-ish); same-region pairs must be 0 (the Swin construction)."""
    pad_res = (4, 6, 8)
    win = (2, 3, 4)
    shift = (1, 1, 2)
    mask = np.asarray(get_shift_window_mask(pad_res, win, shift))
    nlon = pad_res[2] // win[2]
    n_plat = (pad_res[0] // win[0]) * (pad_res[1] // win[1])
    N = win[0] * win[1] * win[2]
    assert mask.shape == (nlon, n_plat, N, N)
    # valid entries are exactly 0; invalid strongly negative
    vals = np.unique(mask)
    assert 0.0 in vals and vals.min() < -1e3
    # diagonal (self-attention) is always allowed
    assert np.all(mask[..., np.arange(N), np.arange(N)] == 0.0)
    # the first (unshifted-interior) window block has no boundary: fully valid
    assert np.all(mask[0, 0] == 0.0) or np.all(mask[-1, -1] <= 0.0)
    # masking is symmetric: i blocked from j <=> j blocked from i
    assert np.array_equal(mask, np.swapaxes(mask, -1, -2))
