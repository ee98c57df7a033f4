"""Discrete-continuous (DISCO) convolution on the sphere.

TPU-native replacement for torch-harmonics' ``DiscreteContinuousConvS2``
(bound by the reference at ``makani/models/networks/fourcastnet3.py:188-205``):
a local spherical convolution defined by a continuous kernel expanded in a
fixed basis and evaluated at the true angular offsets between grid points,

    y[o, p_out] = sum_k w[o, c, k] * sum_{p_in} psi_k(p_out, p_in) q(p_in) x[c, p_in]

with psi_k supported on a geodesic disc of radius ``theta_cutoff``.

Basis families:
  * our own (default) families: radial profiles x azimuthal harmonics,
    K = 1 + (n_r - 1) * n_phi, center node isotropic — span the same
    anisotropic local-filter space as torch-harmonics' bases with a
    different parametrization of the learned weights;
  * "... th" families ("piecewise linear th", "morlet th", "zernike th",
    "fourier-bessel th"): documented re-derivations of the torch-harmonics
    >= 0.9 conventions (layout AND values) for checkpoint import;
  * "tabulated:<name>": basis values interpolated from a registered dense
    (r, alpha) table — export one with scripts/export_th_filter_basis.py on
    any machine with torch-harmonics installed for guaranteed-exact import
    of that install's convention (register_basis_table/load_basis_table).

TPU structure (instead of the reference's sparse CUDA gather):

  * equiangular grids are longitude-translation invariant modulo the
    input/output lon ratio: with nlon_in = g*a, nlon_out = g*b, output
    columns split into b phases sharing one psi table each, applied with
    an input stride of a,
  * each (phase, band-row) is a **per-latitude grouped 1D circular
    convolution** (XLA ``conv_general_dilated`` with
    ``feature_group_count = nlat_out``: every output latitude gets its own
    filter) — static shapes, conv-unit friendly,
  * the few polar rows whose disc wraps more longitude than the banded
    window are computed exactly via FFT circular correlation,
  * the (channels x basis) -> out-channels contraction is one large matmul
    (in the flax layer).

All tables are float64-precomputed numpy, stored fp32.
"""

from __future__ import annotations

import math
import os as _os
from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from makani_tpu.ops.quadrature import precompute_latitudes

__all__ = [
    "DiscoConvS2",
    "compute_cutoff_radius",
    "num_basis_functions",
    "register_basis_table",
    "load_basis_table",
    "disco_table_context",
    "disco_table_registry",
]


# --- psi tables as runtime arguments (MAKANI_DISCO_TABLE_ARGS) ------------
#
# By default every psi-derived table reaches XLA as a baked HLO constant
# (jnp.asarray on host numpy at trace time). At FCN3.1's dense-table sizes
# and at 0.25 deg the serialized constants exceed the compile-transport
# request limit (HTTP 413 on the relay) and bloat every compile. With a
# table context active, each table is instead looked up from a caller-passed
# pytree of device arrays — the tables become ordinary jit ARGUMENTS and the
# serialized program stays small. Protocol:
#
#   1. trace the step once with no context (jax.eval_shape) — every
#      DiscoConvS2 call site registers its host table in the registry;
#   2. device_put the registry and pass it as an extra step argument;
#   3. trace/compile the step inside ``disco_table_context(tables)``.
#
# Keys are derived from the conv config (the _precompute_psi cache key), so
# they are deterministic across traces. A key missing from the active
# context falls back to the baked-constant path.
import threading as _threading
from contextlib import contextmanager as _contextmanager

_TABLE_REGISTRY: dict = {}
_TABLE_CTX = _threading.local()


def disco_table_registry() -> dict:
    """Host-numpy psi tables registered by DiscoConvS2 call sites (trace once
    with jax.eval_shape to populate for a given program)."""
    return _TABLE_REGISTRY


@_contextmanager
def disco_table_context(tables: dict):
    """Serve registered psi tables from ``tables`` (device/traced arrays)
    instead of baking them as HLO constants. Active at trace time."""
    prev = getattr(_TABLE_CTX, "tables", None)
    _TABLE_CTX.tables = tables
    try:
        yield
    finally:
        _TABLE_CTX.tables = prev


def compute_cutoff_radius(nlat: int, kernel_shape, basis_type: str = "piecewise linear") -> float:
    """Cutoff heuristic matching the reference (fourcastnet3.py:47-50)."""
    if basis_type.startswith("tabulated:"):
        return float(_BASIS_TABLES[basis_type.split(":", 1)[1]]["r_cutoff"])
    factor = {
        "piecewise linear": 0.5,
        "piecewise linear th": 0.5,
        "morlet": 0.5,
        "morlet th": 0.5,
        "harmonic": 0.5,
        "zernike": math.sqrt(2.0),
        "zernike th": math.sqrt(2.0),
        "fourier-bessel": 0.5,
        "fourier-bessel th": 0.5,
    }.get(basis_type, 0.5)
    return (kernel_shape[0] + 1) * factor * math.pi / float(nlat - 1)


def compute_cutoff_radius_lmax(lmax: int, kernel_shape, basis_type: str = "piecewise linear") -> float:
    """FCN3.1 cutoff heuristic: kernel radius from the spectral truncation
    rather than the grid resolution (ref fourcastnet3_1.py:55-57)."""
    if basis_type.startswith("tabulated:"):
        return float(_BASIS_TABLES[basis_type.split(":", 1)[1]]["r_cutoff"])
    margin = {
        "piecewise linear": 1.0,
        "piecewise linear th": 1.0,
        "morlet": 1.0,
        "morlet th": 1.0,
        "harmonic": 1.0,
        "zernike": 1.0,
        "zernike th": 1.0,
        "fourier-bessel": 1.5,
        "fourier-bessel th": 1.5,
    }.get(basis_type, 1.0)
    return margin * kernel_shape[0] * math.pi / float(max(lmax, 1))


def num_basis_functions(kernel_shape, basis_type: str = "piecewise linear") -> int:
    """Basis count K. Layout is family-dependent:

      * our own families share K = 1 + (n_r - 1) * n_phi (center node +
        (n_r - 1) radial levels x n_phi azimuthal functions),
      * the "... th" torch-harmonics import conventions use that library's
        layouts (see the per-family docs in _basis_values below),
      * "tabulated:<name>" takes K from the registered table.
    """
    n_r, n_phi = kernel_shape
    if basis_type == "piecewise linear th":
        # th counts n_r collocation nodes across the *diameter*:
        # odd n_r -> isotropic center + (n_r // 2) rings x n_phi hats
        return (n_r // 2) * n_phi + n_r % 2
    if basis_type in ("morlet th", "fourier-bessel th"):
        return n_r * n_phi
    if basis_type == "zernike th":
        # all Zernike Z_n^m with radial order n < n_r (OSA enumeration)
        return n_r * (n_r + 1) // 2
    if basis_type.startswith("tabulated:"):
        return int(_BASIS_TABLES[basis_type.split(":", 1)[1]]["vals"].shape[0])
    return 1 + (n_r - 1) * n_phi


def _radial_profiles(rr, kernel_shape, theta_cutoff, basis_type):
    """Radial profile family R_q, q = 0..n_r-1 (R_0 is the isotropic center).

    Every basis family shares the layout K = 1 + (n_r - 1) * n_phi (center
    node + (n_r - 1) radial levels x n_phi azimuthal functions) so the learned
    weight tensor shape is uniform across bases. The families are documented
    TPU-native realizations of the reference's basis names (torch-harmonics
    FilterBasis, bound at ref fourcastnet3.py:189-205); they span equivalent
    anisotropic local-filter spaces — exact basis values (and hence the
    parametrization of the learned weights) are implementation conventions:

      * "piecewise linear"      — triangular hats at radii q * dr, dr = cutoff/n_r
        (same radial nodes/dr as torch-harmonics' convention)
      * "harmonic"              — disc radial harmonics cos(pi q r / cutoff)
      * "morlet"                — Gaussian-windowed radial oscillations
        exp(-(2r/cutoff)^2 / 2) * cos(pi q r / cutoff)
      * "zernike"               — even Zernike radial polynomials R_{2q}^0(r/cutoff)
      * "fourier-bessel"        — J_0(j_{0,q} r / cutoff) with j_{0,q} the
        q-th positive zero of the Bessel J_0
    """
    n_r, _ = kernel_shape
    x = np.clip(rr / theta_cutoff, 0.0, 1.0)  # normalized radius in [0, 1]

    if basis_type == "piecewise linear":
        dr = theta_cutoff / n_r
        return [np.clip(1.0 - np.abs(rr - q * dr) / dr, 0.0, None) for q in range(n_r)]
    if basis_type == "harmonic":
        return [np.cos(math.pi * q * x) if q else np.ones_like(x) for q in range(n_r)]
    if basis_type == "morlet":
        env = np.exp(-2.0 * x * x)
        return [env * np.cos(math.pi * q * x) for q in range(n_r)]
    if basis_type == "zernike":
        # even Zernike radial polynomials: 1, 2x^2-1, 6x^4-6x^2+1, ...
        return [_zernike_r2q0(x, q) for q in range(n_r)]
    if basis_type == "fourier-bessel":
        from scipy.special import j0, jn_zeros

        zeros = jn_zeros(0, n_r)
        return [np.ones_like(x) if q == 0 else j0(zeros[q - 1] * x) for q in range(n_r)]
    raise NotImplementedError(f"basis_type {basis_type}")


def _zernike_r2q0(x, q):
    """Zernike radial polynomial R_{2q}^0(x) by its explicit sum."""
    out = np.zeros_like(x)
    for s in range(q + 1):
        c = (-1) ** s * math.factorial(2 * q - s) / (math.factorial(s) * math.factorial(q - s) ** 2)
        out = out + c * x ** (2 * (q - s))
    return out


def _azimuth_values(alpha, p, n_phi, basis_type):
    """Azimuthal function p of n_phi at bearing alpha."""
    # cos/sin harmonic pairs (all other families)
    if p == 0:
        return np.ones_like(alpha)
    if p % 2 == 1:
        return np.cos(((p + 1) // 2) * alpha)
    return np.sin((p // 2) * alpha)


# ---------------------------------------------------------------------------
# torch-harmonics import conventions ("... th") and tabulated bases
#
# torch-harmonics (>= 0.9, the version the reference pins) is not installable
# in this environment; the "th" families below are documented re-derivations
# of its filter-basis conventions, validated against an independent dense
# implementation (tests/test_convert_parity.py). For guaranteed-exact import
# of any torch-harmonics version, export the basis values where the library
# IS installed (scripts/export_th_filter_basis.py) and load them here as a
# tabulated basis — interpolation error is ~1e-6 for these smooth families.
# ---------------------------------------------------------------------------

_BASIS_TABLES: dict = {}


def register_basis_table(name: str, table: dict) -> str:
    """Register a dense (r, alpha) basis-value table; returns the basis_type
    string ("tabulated:<name>") to pass to DiscoConvS2.

    table keys: "vals" (K, Nr, Na) float64, "r" (Nr,) geodesic radii
    ascending from 0, "alpha" (Na,) bearings covering [0, 2pi), and
    "r_cutoff" (scalar).
    """
    t = {k: np.asarray(v) if k != "r_cutoff" else float(np.asarray(v)) for k, v in table.items()}
    if t["vals"].ndim != 3 or t["r"].ndim != 1 or t["alpha"].ndim != 1:
        raise ValueError("basis table needs vals (K, Nr, Na), r (Nr,), alpha (Na,)")
    _BASIS_TABLES[name] = t
    _precompute_psi.cache_clear()  # tables are identified by name in the cache key
    return f"tabulated:{name}"


def load_basis_table(path: str, name: str = None) -> str:
    """Load an npz written by scripts/export_th_filter_basis.py and register it."""
    import os

    with np.load(path) as z:
        table = {k: z[k] for k in ("vals", "r", "alpha", "r_cutoff")}
    return register_basis_table(name or os.path.splitext(os.path.basename(path))[0], table)


def _tabulated_values(r, alpha, name):
    """Bilinear interpolation of a registered basis table in (r, alpha);
    alpha is periodic."""
    t = _BASIS_TABLES[name]
    vals, rg, ag = t["vals"], t["r"], t["alpha"]
    K, Nr, Na = vals.shape

    ri = np.interp(r, rg, np.arange(Nr))  # fractional row index, clamped
    a = np.mod(alpha, 2.0 * np.pi)
    # assume uniform alpha grid starting at ag[0]
    da = (2.0 * np.pi) / Na
    ai = (a - ag[0]) / da
    r0 = np.clip(np.floor(ri).astype(np.int64), 0, Nr - 2)
    a0 = np.floor(ai).astype(np.int64)
    fr = np.clip(ri - r0, 0.0, 1.0)
    fa = ai - a0
    a0 = np.mod(a0, Na)
    a1 = np.mod(a0 + 1, Na)
    v00 = vals[:, r0, a0]
    v01 = vals[:, r0, a1]
    v10 = vals[:, r0 + 1, a0]
    v11 = vals[:, r0 + 1, a1]
    return v00 * (1 - fr) * (1 - fa) + v01 * (1 - fr) * fa + v10 * fr * (1 - fa) + v11 * fr * fa


def _pl_th_values(r, alpha, kernel_shape, theta_cutoff):
    """torch-harmonics anisotropic piecewise-linear convention.

    kernel_shape[0] = n_r counts collocation nodes across the kernel
    *diameter* at spacing dr = 2 * cutoff / (n_r + 1) (this is why the
    reference's cutoff heuristic is (n_r + 1) * 0.5 * pi / (nlat - 1): the
    node spacing then equals one latitude grid spacing). Triangular hats
    radially x periodic triangular hats azimuthally at p * 2pi/n_phi.
    Odd n_r: basis 0 is the isotropic center hat, then rings q = 1..n_r//2
    at q * dr. Even n_r: rings only, at (q + 1/2) * dr, q = 0..n_r//2 - 1.
    """
    n_r, n_phi = kernel_shape
    dr = 2.0 * theta_cutoff / (n_r + 1)
    dphi = 2.0 * math.pi / n_phi
    rr = np.clip(r, 0.0, None)

    def tri_r(node):
        return np.clip(1.0 - np.abs(rr - node) / dr, 0.0, None)

    def tri_phi(p):
        d = np.abs(np.mod(alpha - p * dphi + math.pi, 2.0 * math.pi) - math.pi)
        return np.clip(1.0 - d / dphi, 0.0, None)

    out = []
    if n_r % 2 == 1:
        out.append(tri_r(0.0))  # isotropic center
        for q in range(1, n_r // 2 + 1):
            for p in range(n_phi):
                out.append(tri_r(q * dr) * tri_phi(p))
    else:
        for q in range(n_r // 2):
            for p in range(n_phi):
                out.append(tri_r((q + 0.5) * dr) * tri_phi(p))
    return np.stack(out)


def _harmonic_1d(idx, t):
    """1-D harmonic family: h_0 = 1, h_{2m-1} = sin(pi m t), h_{2m} = cos(pi m t)."""
    if idx == 0:
        return np.ones_like(t)
    m = (idx + 1) // 2
    return np.sin(math.pi * m * t) if idx % 2 == 1 else np.cos(math.pi * m * t)


def _morlet_th_values(r, alpha, kernel_shape, theta_cutoff):
    """torch-harmonics Morlet convention (documented re-derivation).

    Separable Gabor/Morlet tensor products on the tangent plane: with
    normalized Cartesian offsets x = (r/c) cos(alpha), y = (r/c) sin(alpha),
    basis (i, j) = exp(-(x^2+y^2) / (2 sigma^2)) * h_i(x) * h_j(y), sigma =
    1/2, h the 1-D harmonic family above. K = n_r * n_phi, x-index fastest.
    """
    n_x, n_y = kernel_shape
    x = (r / theta_cutoff) * np.cos(alpha)
    y = (r / theta_cutoff) * np.sin(alpha)
    sigma = 0.5
    env = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    out = []
    for j in range(n_y):
        hy = _harmonic_1d(j, y)
        for i in range(n_x):
            out.append(env * _harmonic_1d(i, x) * hy)
    return np.stack(out)


def _zernike_nm(x, n, m):
    """Zernike radial polynomial R_n^m(x), m >= 0, n - m even."""
    out = np.zeros_like(x)
    for s in range((n - m) // 2 + 1):
        c = (-1) ** s * math.factorial(n - s) / (
            math.factorial(s) * math.factorial((n + m) // 2 - s) * math.factorial((n - m) // 2 - s)
        )
        out = out + c * x ** (n - 2 * s)
    return out


def _zernike_th_values(r, alpha, kernel_shape, theta_cutoff):
    """torch-harmonics Zernike convention (documented re-derivation).

    All Zernike polynomials Z_n^m on the cutoff disc with radial order
    n < n_r, OSA-style enumeration ((n, m) ascending, m = -n..n step 2;
    m < 0 -> sin(|m| alpha), m >= 0 -> cos(m alpha)). K = n_r (n_r + 1) / 2.
    """
    n_r, _ = kernel_shape
    rho = np.clip(r / theta_cutoff, 0.0, 1.0)
    out = []
    for n in range(n_r):
        for m in range(-n, n + 1, 2):
            rad = _zernike_nm(rho, n, abs(m))
            ang = np.sin(abs(m) * alpha) if m < 0 else np.cos(m * alpha)
            out.append(rad * ang)
    return np.stack(out)


def _fourier_bessel_th_values(r, alpha, kernel_shape, theta_cutoff):
    """torch-harmonics Fourier-Bessel convention (documented re-derivation).

    Dirichlet disc harmonics: basis (q, p) = J_m(j_{m, q+1} r / c) * a_p,
    with a_p the azimuthal harmonic family (1, cos, sin, cos 2, ...) of
    order m = (p + 1) // 2 and j_{m, k} the k-th positive zero of J_m.
    K = n_r * n_phi, azimuthal index fastest.
    """
    from scipy.special import jn_zeros, jv

    n_r, n_phi = kernel_shape
    rho = np.clip(r / theta_cutoff, 0.0, 1.0)
    out = []
    for q in range(n_r):
        for p in range(n_phi):
            m = (p + 1) // 2
            zero = jn_zeros(m, q + 1)[q]
            rad = jv(m, zero * rho)
            if p == 0:
                ang = np.ones_like(alpha)
            elif p % 2 == 1:
                ang = np.cos(m * alpha)
            else:
                ang = np.sin(m * alpha)
            out.append(rad * ang)
    return np.stack(out)


def _basis_values(r, alpha, kernel_shape, theta_cutoff, basis_type="piecewise linear"):
    """All K basis functions at geodesic radius r, bearing alpha: (K, *shape)."""
    if basis_type == "piecewise linear th":
        return _pl_th_values(r, alpha, kernel_shape, theta_cutoff)
    if basis_type == "morlet th":
        return _morlet_th_values(r, alpha, kernel_shape, theta_cutoff)
    if basis_type == "zernike th":
        return _zernike_th_values(r, alpha, kernel_shape, theta_cutoff)
    if basis_type == "fourier-bessel th":
        return _fourier_bessel_th_values(r, alpha, kernel_shape, theta_cutoff)
    if basis_type.startswith("tabulated:"):
        return _tabulated_values(r, alpha, basis_type.split(":", 1)[1])

    n_r, n_phi = kernel_shape
    rr = np.clip(r, 0.0, None)
    radials = _radial_profiles(rr, kernel_shape, theta_cutoff, basis_type)

    out = [radials[0]]  # isotropic center node
    for q in range(1, n_r):
        for p in range(n_phi):
            out.append(radials[q] * _azimuth_values(alpha, p, n_phi, basis_type))
    return np.stack(out)


@lru_cache(maxsize=16)  # bounded: psi tables are tens of MB per config
def _precompute_psi(in_shape, out_shape, kernel_shape, grid_in, grid_out, theta_cutoff, basis_norm_mode, basis_type="piecewise linear"):
    """Precompute psi tables for all phases.

    Returns dict with:
      band_start (Hout,), BL, halo, stride a, phases b,
      psi_band: (b, K, Hout, BL, WW)   — banded window tables per phase,
      polar_rows, psi_polar: (b, K, P, BL, Win) — full-lon tables.
    """
    nlat_in, nlon_in = in_shape
    nlat_out, nlon_out = out_shape

    g = math.gcd(nlon_in, nlon_out)
    a, b = nlon_in // g, nlon_out // g  # stride a per phase, b phases

    theta_in, wq = precompute_latitudes(nlat_in, grid=grid_in)
    theta_out, _ = precompute_latitudes(nlat_out, grid=grid_out)
    dphi_in = 2.0 * np.pi / nlon_in
    dphi_out = 2.0 * np.pi / nlon_out
    quad = wq * dphi_in  # input cell measure, sums to 4 pi over the sphere

    K = num_basis_functions(kernel_shape, basis_type)

    # latitude bands
    starts = []
    widths = []
    for ho in range(nlat_out):
        rows = np.nonzero(np.abs(theta_in - theta_out[ho]) <= theta_cutoff + 1e-12)[0]
        starts.append(int(rows[0]))
        widths.append(int(rows[-1]) - int(rows[0]) + 1)
    BL = max(widths)
    band_start = np.array([min(s, nlat_in - BL) for s in starts], np.int64)
    ti_idx = band_start[:, None] + np.arange(BL)[None, :]  # (Hout, BL)

    # longitude window halo (input-grid units): max angular reach of the disc
    # at the least-polar band rows; clamp and spill wide rows to the polar path
    def lon_reach(ho):
        to = theta_out[ho]
        reach = 0
        for hi in ti_idx[ho]:
            ti = theta_in[hi]
            s = np.sin(ti) * np.sin(to)
            if s <= 1e-9:
                return nlon_in  # a pole row in the band: full wrap possible
            cosd = (np.cos(theta_cutoff) - np.cos(ti) * np.cos(to)) / s
            if cosd < -1.0:
                return nlon_in
            if cosd > 1.0:
                continue
            reach = max(reach, int(np.ceil(np.arccos(cosd) / dphi_in)) + 1)
        return 2 * reach + 1

    reaches = np.array([lon_reach(ho) for ho in range(nlat_out)])
    med = max(int(np.median(reaches[reaches < nlon_in])) if (reaches < nlon_in).any() else 3, 3)
    WW = min(2 * med + 1, nlon_in - 1 if nlon_in % 2 == 0 else nlon_in)
    halo = WW // 2
    polar_rows = [int(h) for h in np.nonzero(reaches > WW)[0]]

    def build_tables(phase):
        # center input position of output column `phase`
        c_p = phase * nlon_in / nlon_out
        base = int(np.floor(c_p))
        # window offsets relative to base
        offs = np.arange(-halo, halo + 1)
        dphi_off = (base + offs) * dphi_in - phase * dphi_out  # angular offsets
        psi = _eval(dphi_off)
        # full-longitude table (offsets 0..nlon_in-1 from base)
        offs_full = np.arange(nlon_in)
        dphi_full = (base + offs_full) * dphi_in - phase * dphi_out
        psi_full = _eval(dphi_full)
        return psi, psi_full, base

    def _eval(dphi_off):
        to = theta_out[:, None, None]
        ti = theta_in[ti_idx][:, :, None]
        ph = dphi_off[None, None, :]
        cosr = np.cos(to) * np.cos(ti) + np.sin(to) * np.sin(ti) * np.cos(ph)
        r = np.arccos(np.clip(cosr, -1.0, 1.0))
        alpha = np.arctan2(
            np.sin(ph) * np.sin(ti) * np.ones_like(to),
            np.cos(ti) * np.sin(to) - np.sin(ti) * np.cos(to) * np.cos(ph),
        )
        psi = _basis_values(r, alpha, kernel_shape, theta_cutoff, basis_type)  # (K, Hout, BL, Woff)
        psi = np.where(r[None] <= theta_cutoff, psi, 0.0)
        return psi * quad[ti_idx][None, :, :, None]

    psi_band = np.zeros((b, K, nlat_out, BL, WW), np.float64)
    psi_polar_l = []
    bases = np.zeros(b, np.int64)
    for p in range(b):
        pb, pf, base = build_tables(p)
        psi_band[p] = pb
        psi_polar_l.append(pf[:, polar_rows] if polar_rows else np.zeros((K, 0, BL, nlon_in)))
        bases[p] = base

    # basis normalization, measured on the full-support (phase 0) tables
    # (our conventions; they reparametrize the learned weights):
    #   "mean"  — unit mean L1 mass per basis function,
    #   "nodal" — unit discrete (nodal) L2 norm per basis function
    #             (the quadrature-weighted psi evaluated at the grid nodes),
    #   "support" — unit mean support measure (quadrature mass of the
    #             nonzero set), "none" — raw basis values.
    _, pf0, _ = build_tables(0)
    if basis_norm_mode in ("mean", "nodal", "support"):
        if basis_norm_mode == "mean":
            mass = np.abs(pf0).sum(axis=(2, 3)).mean(axis=1)
        elif basis_norm_mode == "nodal":
            mass = np.sqrt(np.square(pf0).sum(axis=(2, 3))).mean(axis=1)
        else:  # support
            supp = (np.abs(pf0) > 0).astype(np.float64) * quad[ti_idx][None, :, :, None]
            mass = supp.sum(axis=(2, 3)).mean(axis=1)
        scale = 1.0 / np.maximum(mass, 1e-12)
        psi_band *= scale[None, :, None, None, None]
        psi_polar_l = [pp * scale[:, None, None, None] for pp in psi_polar_l]
        pf0 = pf0 * scale[:, None, None, None]
    elif basis_norm_mode not in ("none", None):
        raise NotImplementedError(f"basis_norm_mode {basis_norm_mode}")

    # per-basis L1 response mass of the *normalized* tables: the worst-case
    # (smooth/constant input) gain of each basis response. DiscoConv folds
    # 1/sqrt(sum_k mass_k^2) into its weight-init std so the conv output is
    # O(<=1) at init regardless of the basis normalization convention — under
    # "mean" every mass is 1 by construction and the init reduces to the
    # classic sqrt(gain / (cin*K)); under "nodal" (unit discrete L2, used by
    # the FCN3.1 recipe) the L1 masses grow ~sqrt(support), which un-checked
    # made an untrained FCN3.1 *decoder* (smooth upsampled input at full
    # resolution) amplify ~3x per step (round-4 verdict, weak #3).
    init_mass = np.abs(pf0).sum(axis=(2, 3)).mean(axis=1)

    for h in polar_rows:
        psi_band[:, :, h] = 0.0

    return dict(
        band_start=band_start.astype(np.int32),
        BL=BL,
        halo=halo,
        stride=a,
        phases=b,
        bases=bases,
        psi_band=psi_band.astype(np.float32),
        polar_rows=polar_rows,
        psi_polar=np.stack(psi_polar_l).astype(np.float32),
        init_mass=init_mass.astype(np.float32),
    )


class DiscoConvS2:
    """Precomputed-psi DISCO basis contraction:
    x (B, C, Hin, Win) -> t (B, C, K, Hout, Wout)."""

    def __init__(self, in_shape, out_shape, kernel_shape=(3, 4), basis_type="piecewise linear", basis_norm_mode="mean", grid_in="equiangular", grid_out="equiangular", theta_cutoff=None):
        self.in_shape = tuple(in_shape)
        self.out_shape = tuple(out_shape)
        self.kernel_shape = tuple(kernel_shape)
        self.basis_type = basis_type
        if theta_cutoff is None:
            if basis_type.startswith("tabulated:"):
                theta_cutoff = _BASIS_TABLES[basis_type.split(":", 1)[1]]["r_cutoff"]
            else:
                theta_cutoff = compute_cutoff_radius(in_shape[0], kernel_shape, basis_type)
        self.theta_cutoff = float(theta_cutoff)
        self.K = num_basis_functions(kernel_shape, basis_type)

        tbl = _precompute_psi(
            self.in_shape, self.out_shape, self.kernel_shape, grid_in, grid_out, self.theta_cutoff, basis_norm_mode, basis_type
        )
        self.__dict__.update(tbl)
        self._tab_base = (
            f"{self.in_shape}|{self.out_shape}|{self.kernel_shape}|{basis_type}"
            f"|{grid_in}|{grid_out}|{basis_norm_mode}|{self.theta_cutoff:.12g}"
        )
        self.WW = 2 * self.halo + 1
        # MAKANI_DISCO_BF16=1 runs the banded conv in bfloat16 (MXU conv with
        # fp32 accumulation; halves the (B, C, K, Hout, Wout) response bytes).
        # The polar FFT rows always stay fp32.
        import os as _os

        self.compute_dtype = jnp.bfloat16 if _os.environ.get("MAKANI_DISCO_BF16", "0") == "1" else jnp.float32

    def _tab(self, tag: str, build) -> jnp.ndarray:
        """Return a psi-derived table for this conv: from the active table
        context (as a traced jit argument) when one is set and holds the key,
        else as a baked constant — registering the host array either way so a
        registry-filling trace discovers every table the program needs."""
        key = f"disco|{self._tab_base}|{tag}"
        arr = _TABLE_REGISTRY.get(key)
        if arr is None:
            arr = np.ascontiguousarray(build())
            _TABLE_REGISTRY[key] = arr
        ctx = getattr(_TABLE_CTX, "tables", None)
        if ctx is not None and key in ctx:
            return ctx[key]
        return jnp.asarray(arr)

    def __call__(self, x: jnp.ndarray, _split_polar: bool = False):
        B, C, Hin, Win = x.shape
        Hout, Wout = self.out_shape
        K, BL, halo = self.K, self.BL, self.halo
        a, b = self.stride, self.phases
        split_polar = _split_polar

        band_rows = self.band_start[:, None] + np.arange(BL)[None, :]  # (Hout, BL)
        xb = x[:, :, band_rows.reshape(-1), :].reshape(B, C, Hout, BL, Win)

        phase_outputs = []
        polar_outputs = []
        for p in range(b):
            base = int(self.bases[p])
            # circular shift so the window start sits at index 0
            xs = jnp.roll(xb, -(base - halo), axis=-1)
            # pad right so strided VALID windows cover all output columns
            n_out_p = Wout // b
            needed = (n_out_p - 1) * a + self.WW
            if needed > Win:
                xs = jnp.concatenate([xs, xs[..., : needed - Win]], axis=-1)
            # one grouped conv for the whole band: each latitude group maps its
            # BL band rows (input features) to its K basis responses (output
            # features) — replaces the former per-band-row loop that re-read
            # the windowed input BL times
            inp = xs.reshape(B * C, Hout * BL, xs.shape[-1]).astype(self.compute_dtype)
            filt = self._tab(f"band_{p}", lambda p=p: self.psi_band[p]).astype(self.compute_dtype)  # (K, Hout, BL, WW)
            filt = jnp.transpose(filt, (1, 0, 2, 3)).reshape(Hout * K, BL, self.WW)
            out = jax.lax.conv_general_dilated(
                inp,
                filt,
                window_strides=(a,),
                padding="VALID",
                dimension_numbers=("NCW", "OIW", "NCW"),
                feature_group_count=Hout,
            )  # (B*C, Hout*K, n_out_p)
            t_p = out.reshape(B, C, Hout, K, n_out_p).transpose(0, 1, 3, 2, 4)

            # polar rows: exact FFT circular correlation over all longitudes
            if self.polar_rows:
                from makani_tpu.ops import fft_compat

                rows = np.asarray(self.polar_rows)
                xb_p = xb[:, :, rows]  # (B, C, P, BL, Win)
                Xs = fft_compat.rfft_s(xb_p.astype(jnp.float32), axis=-1)
                # psi_polar offsets are relative to `base`; roll to absolute
                psi_p = np.roll(self.psi_polar[p], int(self.bases[p]), axis=-1)
                Ps = fft_compat.rfft_s(jnp.asarray(psi_p), axis=-1)  # (K,P,BL,M,2)
                re = jnp.einsum("bcpjm,kpjm->bckpm", Xs[..., 0], Ps[..., 0]) + jnp.einsum(
                    "bcpjm,kpjm->bckpm", Xs[..., 1], Ps[..., 1]
                )
                im = jnp.einsum("bcpjm,kpjm->bckpm", Xs[..., 1], Ps[..., 0]) - jnp.einsum(
                    "bcpjm,kpjm->bckpm", Xs[..., 0], Ps[..., 1]
                )
                corr = fft_compat.irfft_s(jnp.stack([re, im], axis=-1), n=Win, axis=-1, norm="backward")
                # sample at this phase's output columns: the phase offset is
                # already folded into the psi table, so column u sits at shift u*a
                cols = (np.arange(n_out_p) * a) % Win
                t_pp = corr[..., cols]
                if split_polar:
                    polar_outputs.append(t_pp.astype(t_p.dtype))
                else:
                    # static-index insert as a one-hot matmul: a scatter
                    # (.at[].set) here makes XLA materialize full-size u32
                    # index tensors in the backward pass (two ~5 GB buffers at
                    # the 0.25-deg decoder); the einsum gradient is a matmul.
                    # No keep-mask is needed: psi_band is zeroed at polar rows,
                    # so the banded conv already wrote exact zeros there.
                    onehot = np.zeros((len(rows), Hout), np.float32)
                    onehot[np.arange(len(rows)), rows] = 1.0
                    t_p = t_p + jnp.einsum("ph,bckpw->bckhw", jnp.asarray(onehot, t_p.dtype), t_pp.astype(t_p.dtype))
            phase_outputs.append(t_p)

        # interleave phases: output column wo = p + b*u
        t = jnp.stack(phase_outputs, axis=-1)  # (B, C, K, Hout, n_out_p, b)
        t = t.reshape(B, C, K, Hout, Wout)
        if split_polar:
            if polar_outputs:
                t_pol = jnp.stack(polar_outputs, axis=-1)  # (B, C, K, P, n_out_p, b)
                t_pol = t_pol.reshape(B, C, K, len(self.polar_rows), Wout)
            else:
                t_pol = None
            return t, t_pol
        return t

    def call_split(self, x: jnp.ndarray):
        """Like ``__call__`` but returns ``(t, t_polar)`` with the polar-row
        responses kept separate: t (B, C, K, Hout, Wout) has exact zeros at
        the polar rows (psi_band is zeroed there) and t_polar is
        (B, C, K, P, Wout) or None. Callers mix channels on each part and
        insert the (much smaller) mixed polar rows — at the FCN3 processor
        blocks the one-hot insert on the pre-mix (B, C, K, H, W) tensor
        dragged a ~10 ms transposed 790 MB copy per block (profiled round 4).
        """
        return self.__call__(x, _split_polar=True)

    # serial op only; the distributed subclass overrides __call__ with its
    # own shard_map body and does not provide the fused path
    supports_fused = True
    supports_split = True

    def fused(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """Weight-fused DISCO conv: x (B, g*ig, Hin, Win), w (g, og, ig, K)
        -> y (B, g*og, Hout, Wout).

        Dispatches between three formulations (MAKANI_DISCO_FUSED=
        dense|window|taps, default "dense"):

        * ``dense`` — per-(phase, shift) dense-latitude GEMMs (see
          ``_fused_dense``). Measured FCN3 0.5-deg default: 0.628
          samples/s/chip vs window's 0.502 (+25%), and it removes the
          (B, Hout, g, ig, BL, Win) band gather entirely (760 MB bf16 at
          the decoder) — the thing whose XLA relayout blocked B=2.
        * ``window`` — the banded window is gathered once into
          (B, Hout, g, ig, BL, Win) and applied as one grouped conv with the
          weights pre-contracted into the psi tables; XLA's per-latitude
          grouped-conv emitters run it at low occupancy (og <= 45 output
          features per group).
        * ``taps`` — per-band-row strided tap slices + small einsums,
          built to dodge the 10 GB XLA relayout of the window gather;
          measured on hardware it REGRESSES B=1 (the WW tap partials at the
          atmo decoder keep ~9 x 315 MB temps alive and the step OOMs by
          1.2 GB), so it stays opt-in.
        """
        mode = _os.environ.get("MAKANI_DISCO_FUSED", "dense")
        if mode == "taps":
            return self._fused_taps(x, w)
        if mode == "dense":
            return self._fused_dense(x, w)
        return self._fused_window(x, w)

    def _fused_window(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """One grouped conv over the gathered latitude band (measured path).

        Pre-contracts the learned weights with the psi tables so the
        (B, C, K, Hout, Wout) basis-response tensor never materializes — the
        banded conv maps (ig * BL) window features directly to the og output
        channels per latitude. Only worthwhile for the channel-grouped
        encoders/decoders where g * og * ig is small (the effective filter is
        (Hout * g * og, ig * BL, WW)); processor blocks with full channel
        mixing use ``mix_first``.
        """
        B = x.shape[0]
        g, og, ig, K = w.shape
        Hout, Wout = self.out_shape
        BL, halo = self.BL, self.halo
        a, b = self.stride, self.phases
        Win = x.shape[-1]
        cdt = self.compute_dtype

        band_rows = self.band_start[:, None] + np.arange(BL)[None, :]  # (Hout, BL)
        xb = x.reshape(B, g, ig, x.shape[-2], Win)[:, :, :, band_rows.reshape(-1), :].reshape(B, g, ig, Hout, BL, Win)
        xb = jnp.transpose(xb, (0, 3, 1, 2, 4, 5))  # (B, Hout, g, ig, BL, Win)

        if self.polar_rows:
            xb_p = xb[:, np.asarray(self.polar_rows)]  # (B, P, g, ig, BL, Win)
            pstate = self._polar_fused_prelude(xb_p, w)

        phase_outputs = []
        for p in range(b):
            base = int(self.bases[p])
            xs = jnp.roll(xb, -(base - halo), axis=-1)
            n_out_p = Wout // b
            needed = (n_out_p - 1) * a + self.WW
            if needed > Win:
                xs = jnp.concatenate([xs, xs[..., : needed - Win]], axis=-1)
            inp = xs.reshape(B, Hout * g * ig * BL, xs.shape[-1]).astype(cdt)
            # effective filter: psi contracted with the learned weights
            psi = self._tab(f"band_{p}", lambda p=p: self.psi_band[p])  # (K, Hout, BL, WW)
            filt = jnp.einsum("goik,khjw->hgoijw", w.astype(jnp.float32), psi)
            filt = filt.reshape(Hout * g * og, ig * BL, self.WW).astype(cdt)
            out = jax.lax.conv_general_dilated(
                inp,
                filt,
                window_strides=(a,),
                padding="VALID",
                dimension_numbers=("NCW", "OIW", "NCW"),
                feature_group_count=Hout * g,
            )  # (B, Hout*g*og, n_out_p)
            y_p = out.reshape(B, Hout, g * og, n_out_p).transpose(0, 2, 1, 3)  # (B, Cout, Hout, n_out_p)

            if self.polar_rows:
                y_p = self._polar_fused_phase(pstate, p, n_out_p, y_p)
            phase_outputs.append(y_p)

        y = jnp.stack(phase_outputs, axis=-1)  # (B, Cout, Hout, n_out_p, b)
        return y.reshape(B, g * og, Hout, Wout)

    def _polar_fused_prelude(self, xb_p: jnp.ndarray, w: jnp.ndarray) -> dict:
        """Phase-independent setup for the fused polar-rows path.

        Default (MAKANI_DISCO_POLAR=fft): rFFT circular correlation with the
        channel mix as a real GEMM. The previous full-window grouped conv was
        profiled on hardware at the 0.5-deg FCN3 decoders (P=58 rows): XLA's
        EmitDepthwise*InSublanes emitters ran it at ~1.8 s/step — 45% of the
        whole train step (PERF.md round 4).

        Contraction order by temp size: mixing over ig first scales the
        temps by og*K*BL (right for decoders, og*BL <= ig); otherwise psi
        applies first and the og mix runs after irfft+sampling in the
        spatial domain (encoders, where ig is tiny and og*K would inflate
        80x). Temps stay in the compute dtype; the psi multiply-sum
        accumulates in fp32.
        """
        g, og, ig, K = w.shape
        BL = self.BL
        Hout = self.out_shape[0]
        rows = np.asarray(self.polar_rows)
        P = len(rows)
        onehot = np.zeros((P, Hout), np.float32)
        onehot[np.arange(P), rows] = 1.0
        st = dict(w=w, g=g, og=og, ig=ig, P=P, onehot=onehot, xb_p=xb_p)
        st["fft"] = _os.environ.get("MAKANI_DISCO_POLAR", "fft") == "fft"
        if st["fft"]:
            from makani_tpu.ops import fft_compat

            st["mix_first"] = og * BL <= ig
            if st["mix_first"]:
                # mix in the spatial domain, then one rFFT of the mixed
                # field: (B, P, g, og, K, BL, M, 2)
                u_sp = jnp.einsum("goik,bpgijw->bpgokjw", w.astype(xb_p.dtype), xb_p)
                Us = fft_compat.rfft_s(u_sp, axis=-1)
                st["Ure"], st["Uim"] = Us[..., 0], Us[..., 1]
            else:
                # (B, P, g, ig, BL, M, 2); phase-independent
                Xs = fft_compat.rfft_s(xb_p, axis=-1)
                st["Xre"], st["Xim"] = Xs[..., 0], Xs[..., 1]
        return st

    def _polar_fused_phase(self, st: dict, p: int, n_out_p: int, y_p: jnp.ndarray) -> jnp.ndarray:
        """Add phase ``p``'s polar-row outputs into y_p (B, Cout, Hout, n_out_p).

        No keep-mask is needed: psi_band is zeroed at the polar rows, so the
        banded path already wrote exact zeros there.
        """
        w, g, og, ig, P = st["w"], st["g"], st["og"], st["ig"], st["P"]
        a = self.stride
        Win = st["xb_p"].shape[-1]
        B = y_p.shape[0]
        onehot = st["onehot"]
        psi_p = np.roll(self.psi_polar[p], int(self.bases[p]), axis=-1)  # (K, P, BL, Win)
        if st["fft"]:
            from makani_tpu.ops import fft_compat

            # corr = irfft(X . conj(PsiF)); psi applied over (k, j) by an
            # explicit broadcast-multiply-sum (never an einsum: complex
            # einsums here lowered to pathologically-padded convs, round 3)
            # align to (1, P, 1, 1, K, BL, M)
            def _pf(part, psi_p=psi_p):
                Pf = np.fft.rfft(psi_p.astype(np.float64), axis=-1)
                comp = Pf.real if part == "re" else Pf.imag
                return comp.transpose(1, 0, 2, 3).astype(np.float32)

            Pre_b = self._tab(f"polarfft_re_{p}", lambda: _pf("re"))[None, :, None, None]
            Pim_b = self._tab(f"polarfft_im_{p}", lambda: _pf("im"))[None, :, None, None]
            cols = (np.arange(n_out_p) * a) % Win
            f32 = jnp.float32
            if st["mix_first"]:
                Ure, Uim = st["Ure"], st["Uim"]
                Yre = (Ure.astype(f32) * Pre_b + Uim.astype(f32) * Pim_b).sum(axis=(4, 5))  # (B, P, g, og, M)
                Yim = (Uim.astype(f32) * Pre_b - Ure.astype(f32) * Pim_b).sum(axis=(4, 5))
                corr = fft_compat.irfft_s(jnp.stack([Yre, Yim], axis=-1), n=Win, axis=-1, norm="backward")
                y_pp = corr[..., cols].reshape(B, P, g * og, n_out_p)
            else:
                # psi first: X (B, P, g, ig, 1, BL, M) -> t (B, P, g, ig, K, M)
                Xre_e = st["Xre"][:, :, :, :, None].astype(f32)
                Xim_e = st["Xim"][:, :, :, :, None].astype(f32)
                Tre = (Xre_e * Pre_b + Xim_e * Pim_b).sum(axis=5)
                Tim = (Xim_e * Pre_b - Xre_e * Pim_b).sum(axis=5)
                corr = fft_compat.irfft_s(jnp.stack([Tre, Tim], axis=-1), n=Win, axis=-1, norm="backward")
                t_pp = corr[..., cols]  # (B, P, g, ig, K, n_out_p)
                y_pp = jnp.einsum("goik,bpgiku->bpgou", w.astype(jnp.float32), t_pp).reshape(B, P, g * og, n_out_p)
        else:
            # circular correlation over the full longitude as a strided
            # VALID grouped conv: pad the input by one extra period
            cdt = self.compute_dtype
            xb_p = st["xb_p"]
            filt_p = jnp.einsum("goik,kpjw->pgoijw", w.astype(jnp.float32), jnp.asarray(psi_p))
            filt_p = filt_p.reshape(P * g * og, ig * self.BL, Win).astype(cdt)
            need_p = (n_out_p - 1) * a + Win
            xsp = jnp.concatenate([xb_p, xb_p[..., : need_p - Win]], axis=-1)
            inp_p = xsp.reshape(B, P * g * ig * self.BL, need_p).astype(cdt)
            out_p = jax.lax.conv_general_dilated(
                inp_p,
                filt_p,
                window_strides=(a,),
                padding="VALID",
                dimension_numbers=("NCW", "OIW", "NCW"),
                feature_group_count=P * g,
            )  # (B, P*g*og, n_out_p)
            y_pp = out_p.reshape(B, P, g * og, n_out_p)
        y_pp = y_pp.transpose(0, 2, 1, 3)
        return y_p + jnp.einsum("ph,bcpw->bchw", jnp.asarray(onehot, y_p.dtype), y_pp.astype(y_p.dtype))

    def _fused_dense(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """Dense-latitude GEMM formulation of the banded window.

        For each (phase, window shift s) the banded psi table is scattered
        into a dense (Hout, Hin) latitude matrix and the whole contraction
        becomes ONE well-shaped MXU GEMM — decoders contract (k, i):
        ``khi,bckiw->bchw`` with M=Hout, K=K*Hin, N=C*W; encoders produce
        the responses ``khi,bciw->bckhw`` first and mix after. Dense over
        latitude costs Hin/BL more FLOPs than the banded grouped conv but
        replaces XLA's low-occupancy per-latitude conv emitters (og <= 45
        output features per group) and the band gather/roll backward storm
        with plain GEMMs; profitable at the full-res encoders/decoders,
        NOT at the internal-resolution processor blocks (36x FLOPs there).

        The decoder order mixes channels over ig first at the input
        resolution: u = w.x (B, g*og, K, Hin, Win), then the dense-latitude
        GEMMs. Polar rows ride the shared FFT path.
        """
        B = x.shape[0]
        g, og, ig, K = w.shape
        Hout, Wout = self.out_shape
        Hin = x.shape[-2]
        BL, halo = self.BL, self.halo
        a, b = self.stride, self.phases
        Win = x.shape[-1]
        cdt = self.compute_dtype

        mix_first = og * BL <= ig
        xg = x.reshape(B, g, ig, Hin, Win)
        if mix_first:
            # u (B, g*og, K, Hin, Win)
            u = jnp.einsum("goik,bgihw->bgokhw", w.astype(x.dtype), xg).reshape(B, g * og, K, Hin, Win)
        else:
            u = x.reshape(B, g * ig, Hin, Win)

        if self.polar_rows:
            band_rows_p = self.band_start[np.asarray(self.polar_rows)][:, None] + np.arange(BL)[None, :]
            xb_p = xg[:, :, :, band_rows_p.reshape(-1), :].reshape(B, g, ig, len(self.polar_rows), BL, Win)
            xb_p = jnp.transpose(xb_p, (0, 3, 1, 2, 4, 5))  # (B, P, g, ig, BL, Win)
            pstate = self._polar_fused_prelude(xb_p, w)

        # dense per-(phase, shift) latitude tables: (b, K, WW, Hout, Hin)
        dense = self._dense_lat_tables()

        # MAKANI_DISCO_DENSE_TILE=T (>0): per-band BLOCKED dense GEMMs — tile
        # the output latitudes into chunks of T rows; each chunk contracts
        # only the contiguous input-band slice its rows actually touch
        # (band_start is monotone), so the FLOP inflation drops from Hin/BL
        # to (stride_h*T + BL)/BL and the baked-in dense table constants
        # shrink by the same factor (the full tables are the dominant
        # device-constant cost at 0.25 deg). T=0 (default) = full dense.
        tile = int(_os.environ.get("MAKANI_DISCO_DENSE_TILE", "0") or 0)

        # ONE wrapped copy of u covering every (phase, shift) window, sliced
        # with static offsets per phase — the previous per-phase jnp.roll
        # materialized b full copies of u (617 MB each at the 0.5-deg B=2
        # atmo decoder; the margin by which B=2 OOMed was 0.4 GB)
        n_out_p = Wout // b
        span = (n_out_p - 1) * a + self.WW
        offs = [int(self.bases[p]) - halo for p in range(b)]
        left = max(0, -min(offs))
        right = max(0, max(o + span for o in offs) - Win)
        parts = ([u[..., Win - left :]] if left else []) + [u] + ([u[..., :right]] if right else [])
        up = (jnp.concatenate(parts, axis=-1) if (left or right) else u).astype(cdt)

        phase_outputs = []
        for p in range(b):
            off = offs[p] + left
            if tile > 0:
                tiles = []
                for h0 in range(0, Hout, tile):
                    h1 = min(h0 + tile, Hout)
                    c0 = int(self.band_start[h0:h1].min())
                    c1 = int(self.band_start[h0:h1].max()) + BL
                    y_t = None
                    for s in range(self.WW):
                        Pd = self._tab(
                            f"dense_tile{tile}_{p}_{s}_{h0}",
                            lambda p=p, s=s, h0=h0, h1=h1, c0=c0, c1=c1: dense[p, :, s, h0:h1, c0:c1],
                        ).astype(cdt)
                        us = up[..., off + s : off + s + (n_out_p - 1) * a + 1 : a][..., c0:c1, :]
                        if mix_first:
                            term = jnp.einsum("khi,bckiw->bchw", Pd, us)
                        else:
                            term = jnp.einsum("khi,bciw->bckhw", Pd, us)
                        y_t = term if y_t is None else y_t + term
                    tiles.append(y_t)
                y_p = jnp.concatenate(tiles, axis=-2)
            elif _os.environ.get("MAKANI_DISCO_DENSE_SCAN", "1") == "1":
                # scan over the WW window shifts with a carried accumulator.
                # The unrolled form emits WW independent GEMMs against the
                # SHARED operand `up`; in the backward pass XLA materializes
                # every GEMM's full-size operand gradient concurrently
                # (b*WW buffers of bf16[B*G, c, K, Hin, n_out_p] — 15 x
                # 617 MB at the 0.5-deg B=2 atmo decoder, the round-5 B=2
                # OOM). A scan serializes them: its transpose accumulates
                # d(up) in the carry, one temp at a time.
                span_w = (n_out_p - 1) * a + 1
                tabs = self._tab(f"dense_t_{p}", lambda p=p: dense[p].transpose(1, 0, 2, 3)).astype(cdt)  # (WW, K, Hout, Hin)
                c_dim = up.shape[1]
                if mix_first:
                    acc0 = jnp.zeros((B, c_dim, Hout, n_out_p), cdt)
                else:
                    acc0 = jnp.zeros((B, c_dim, K, Hout, n_out_p), cdt)

                def _shift_body(acc, sp):
                    Pd_s, s_idx = sp
                    us_s = jax.lax.dynamic_slice_in_dim(up, off + s_idx, span_w, axis=-1)
                    if a != 1:
                        us_s = us_s[..., ::a]
                    if mix_first:
                        return acc + jnp.einsum("khi,bckiw->bchw", Pd_s, us_s), None
                    return acc + jnp.einsum("khi,bciw->bckhw", Pd_s, us_s), None

                y_p, _ = jax.lax.scan(_shift_body, acc0, (tabs, jnp.arange(self.WW)))
            else:
                y_p = None
                for s in range(self.WW):
                    Pd = self._tab(f"dense_{p}_{s}", lambda p=p, s=s: dense[p, :, s]).astype(cdt)  # (K, Hout, Hin)
                    # window shift s at output stride a; up covers every
                    # phase offset so the slice always spans n_out_p columns
                    us = up[..., off + s : off + s + (n_out_p - 1) * a + 1 : a]
                    if mix_first:
                        term = jnp.einsum("khi,bckiw->bchw", Pd, us)
                    else:
                        term = jnp.einsum("khi,bciw->bckhw", Pd, us)
                    y_p = term if y_p is None else y_p + term
            if not mix_first:
                # y_p (B, g*ig, K, Hout, n_out_p) -> mix over (ig, k)
                y_p = jnp.einsum("goik,bgikhw->bgohw", w.astype(y_p.dtype), y_p.reshape(B, g, ig, K, Hout, n_out_p))
                y_p = y_p.reshape(B, g * og, Hout, n_out_p)
            if self.polar_rows:
                y_p = self._polar_fused_phase(pstate, p, n_out_p, y_p)
            phase_outputs.append(y_p)

        y = jnp.stack(phase_outputs, axis=-1)
        return y.reshape(B, g * og, Hout, Wout)

    def _dense_lat_tables(self) -> np.ndarray:
        """Scatter psi_band (b, K, Hout, BL, WW) into dense latitude matrices
        (b, K, WW, Hout, Hin); polar rows are already zeroed in psi_band."""
        if getattr(self, "_dense_cache", None) is not None:
            return self._dense_cache
        b, K = self.phases, self.psi_band.shape[1]
        Hout = self.psi_band.shape[2]
        Hin = self.in_shape[0]
        BL, WW = self.BL, self.WW
        out = np.zeros((b, K, WW, Hout, Hin), np.float32)
        hh = np.arange(Hout)[:, None]
        ii = self.band_start[:, None] + np.arange(BL)[None, :]  # (Hout, BL)
        # psi_band (b, K, Hout, BL, WW) -> (b, K, WW, Hout, BL)
        src = np.transpose(self.psi_band, (0, 1, 4, 2, 3))
        out[:, :, :, hh, ii] = src
        self._dense_cache = out
        return out

    def _fused_taps(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """Tap-loop variant: BL shifted-row lat-gathers, WW strided tap
        slices, small-K einsums (see ``fused`` for when to pick it)."""
        B = x.shape[0]
        g, og, ig, K = w.shape
        Hout, Wout = self.out_shape
        BL, halo = self.BL, self.halo
        a, b = self.stride, self.phases
        Win = x.shape[-1]
        cdt = self.compute_dtype

        xg = x.reshape(B, g, ig, x.shape[-2], Win)
        # channels-second layout (B, Hin, g*ig, Win) up front: every later
        # move is then a well-tiled 2-D transpose. Transposing the 5-D
        # (B, W, Hout, g, ig) view per band row instead left XLA with tiny
        # (g, ig) minor dims whose (8,128) tiling padded 8.8x (a 5 GB temp
        # at the 0.5-deg decoder, the B=2 blocker).
        xh = jnp.transpose(x.reshape(B, g * ig, x.shape[-2], Win), (0, 2, 1, 3)).astype(cdt)

        if self.polar_rows:
            # the few full-longitude polar rows keep the dense banded window
            # (tiny: P rows) and run as a full-window grouped conv
            rows = np.asarray(self.polar_rows)
            P = len(rows)
            band_rows_p = self.band_start[rows][:, None] + np.arange(BL)[None, :]  # (P, BL)
            xb_p = xg[:, :, :, band_rows_p.reshape(-1), :].reshape(B, g, ig, P, BL, Win)
            xb_p = jnp.transpose(xb_p, (0, 3, 1, 2, 4, 5))  # (B, P, g, ig, BL, Win)
            onehot = np.zeros((P, Hout), np.float32)
            onehot[np.arange(P), rows] = 1.0

        phase_outputs = []
        for p in range(b):
            base = int(self.bases[p])
            xs = jnp.roll(xh, -(base - halo), axis=-1)
            n_out_p = Wout // b
            needed = (n_out_p - 1) * a + self.WW
            if needed > Win:
                xs = jnp.concatenate([xs, xs[..., : needed - Win]], axis=-1)
            psi = self._tab(f"band_{p}", lambda p=p: self.psi_band[p])  # (K, Hout, BL, WW)

            y_acc = None
            for j in range(BL):
                rows_j = self.band_start + j  # (Hout,) rows of band position j
                xj = xs[:, rows_j].reshape(B, Hout, g, ig, xs.shape[-1])
                # per-lat fused filter for this band row: (Hout, g, og, ig, WW)
                filt = jnp.einsum("goik,khw->hgoiw", w.astype(jnp.float32), psi[:, :, j]).astype(cdt)
                # WW-tap loop of strided slices + small-K einsums. A grouped
                # conv here (feature_group_count=Hout*g) made XLA materialize
                # the unfolded window operand with the WW=9 tap dim minormost
                # — (8,128)-tiled to 128, an 8.8x-padded 5 GB temp at the
                # 0.5-deg decoder. The tap slices are views of xs and each
                # einsum is a well-tiled batched matmul over ig.
                for t in range(self.WW):
                    zt = xj[..., t : t + (n_out_p - 1) * a + 1 : a]  # (B, Hout, g, ig, n_out_p)
                    out = jnp.einsum("bhgiu,hgoi->bhgou", zt, filt[..., t])
                    y_acc = out if y_acc is None else y_acc + out
            y_p = y_acc.reshape(B, Hout, g * og, n_out_p).transpose(0, 2, 1, 3)  # (B, Cout, Hout, n_out_p)

            if self.polar_rows:
                # circular correlation over the full longitude as a strided
                # VALID grouped conv: pad the input by one extra period
                psi_p = np.roll(self.psi_polar[p], int(self.bases[p]), axis=-1)  # (K, P, BL, Win)
                filt_p = jnp.einsum("goik,kpjw->pgoijw", w.astype(jnp.float32), jnp.asarray(psi_p))
                filt_p = filt_p.reshape(P * g * og, ig * BL, Win).astype(cdt)
                need_p = (n_out_p - 1) * a + Win
                xsp = jnp.concatenate([xb_p, xb_p[..., : need_p - Win]], axis=-1)
                inp_p = xsp.reshape(B, P * g * ig * BL, need_p).astype(cdt)
                out_p = jax.lax.conv_general_dilated(
                    inp_p,
                    filt_p,
                    window_strides=(a,),
                    padding="VALID",
                    dimension_numbers=("NCW", "OIW", "NCW"),
                    feature_group_count=P * g,
                )  # (B, P*g*og, n_out_p)
                y_pp = out_p.reshape(B, P, g * og, n_out_p).transpose(0, 2, 1, 3)
                # no keep-mask: psi_band is zeroed at polar rows, so the
                # banded path already wrote exact zeros there
                y_p = y_p + jnp.einsum("ph,bcpw->bchw", jnp.asarray(onehot, y_p.dtype), y_pp.astype(y_p.dtype))
            phase_outputs.append(y_p)

        y = jnp.stack(phase_outputs, axis=-1)  # (B, Cout, Hout, n_out_p, b)
        return y.reshape(B, g * og, Hout, Wout)

    def mix_first(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """Mix-first DISCO conv: x (B, g*ig, Hin, Win), w (g, og, ig, K)
        -> y (B, g*og, Hout, Wout).

        Reassociates the convolution as y = sum_k psi_k * (W_k x): the
        channel mixing runs FIRST, per basis function, under a lax.scan over
        k. The (B, C, K, Hout, Wout) basis-response tensor of the two-stage
        path never materializes, and because psi is a constant the scan VJP
        keeps only x and the small W_k as residuals — peak memory is
        O(B*C*H*W) instead of K times that. FLOPs are identical to the
        two-stage path (the k-sum moves from the weight contraction into the
        output accumulator). This is the path for full-channel-mixing
        processor convs, where g*og*ig is far too large to pre-contract the
        weights into the psi tables (`fused`); at the published FCN3 recipe
        the two-stage residuals were 7 x 1.5 GB of the B=2 OOM.
        """
        B = x.shape[0]
        g, og, ig, K = w.shape
        Cp = g * og
        Hout, Wout = self.out_shape
        BL, halo = self.BL, self.halo
        a, b = self.stride, self.phases
        Win = x.shape[-1]
        cdt = self.compute_dtype
        n_out_p = Wout // b

        xg = x.reshape(B, g, ig, x.shape[-2], Win).astype(cdt)
        wk = jnp.transpose(w, (3, 0, 1, 2)).astype(cdt)  # (K, g, og, ig)
        psi_band = jnp.asarray(self.psi_band).transpose(1, 0, 2, 3, 4)  # (K, b, Hout, BL, WW)

        if self.polar_rows:
            rows = np.asarray(self.polar_rows)
            P = len(rows)
            band_rows_p = self.band_start[rows][:, None] + np.arange(BL)[None, :]  # (P, BL)
            # roll offsets to absolute per phase (as __call__), stack k-major
            psi_pol = np.stack(
                [np.roll(self.psi_polar[p], int(self.bases[p]), axis=-1) for p in range(b)], axis=1
            )  # (K, b, P, BL, Win)
            psi_pol = jnp.asarray(psi_pol)
            keep = np.ones((Hout,), np.float32)
            keep[rows] = 0.0
            onehot = np.zeros((P, Hout), np.float32)
            onehot[np.arange(P), rows] = 1.0

        def body(acc, inp):
            if self.polar_rows:
                w_k, psib_k, psip_k = inp
            else:
                w_k, psib_k = inp
            z = jnp.einsum("goi,bgihw->bgohw", w_k, xg).reshape(B, Cp, xg.shape[-2], Win)
            if self.polar_rows:
                # tiny: P polar rows keep the dense banded window
                zb_pol = z[:, :, band_rows_p.reshape(-1), :].reshape(B, Cp, P, BL, Win)

            phase_outputs = []
            for p in range(b):
                base = int(self.bases[p])
                zs = jnp.roll(z, -(base - halo), axis=-1)
                needed = (n_out_p - 1) * a + self.WW
                if needed > Win:
                    zs = jnp.concatenate([zs, zs[..., : needed - Win]], axis=-1)
                # band position j as a plain lat gather (same bytes as z)
                # feeding a depthwise per-latitude lon conv; the BL partials
                # sum. The one-shot (Hout, BL) window gather duplicated z
                # BL-fold (two ~1.6 GB temps per scan step at the 0.5-deg
                # processor blocks, the last 8 MB of the B=2 OOM).
                t_p = None
                for j in range(BL):
                    rows_j = self.band_start + j  # (Hout,) rows of band position j
                    zj = zs[:, :, rows_j, :].reshape(B * Cp, Hout, zs.shape[-1])
                    filt = psib_k[p][:, j : j + 1, :].astype(cdt)  # (Hout, 1, WW)
                    out = jax.lax.conv_general_dilated(
                        zj,
                        filt,
                        window_strides=(a,),
                        padding="VALID",
                        dimension_numbers=("NCW", "OIW", "NCW"),
                        feature_group_count=Hout,
                    )  # (B*Cp, Hout, n_out_p)
                    t_p = out if t_p is None else t_p + out
                t_p = t_p.reshape(B, Cp, Hout, n_out_p)

                if self.polar_rows:
                    from makani_tpu.ops import fft_compat

                    zb_p = zb_pol  # (B, Cp, P, BL, Win), polar rows stay fp32
                    Xs = fft_compat.rfft_s(zb_p.astype(jnp.float32), axis=-1)
                    Ps = fft_compat.rfft_s(psip_k[p].astype(jnp.float32), axis=-1)  # (P, BL, M, 2)
                    re = jnp.einsum("bcpjm,pjm->bcpm", Xs[..., 0], Ps[..., 0]) + jnp.einsum(
                        "bcpjm,pjm->bcpm", Xs[..., 1], Ps[..., 1]
                    )
                    im = jnp.einsum("bcpjm,pjm->bcpm", Xs[..., 1], Ps[..., 0]) - jnp.einsum(
                        "bcpjm,pjm->bcpm", Xs[..., 0], Ps[..., 1]
                    )
                    corr = fft_compat.irfft_s(jnp.stack([re, im], axis=-1), n=Win, axis=-1, norm="backward")
                    cols = (np.arange(n_out_p) * a) % Win
                    t_pp = corr[..., cols]  # (B, Cp, P, n_out_p)
                    t_p = t_p * jnp.asarray(keep, t_p.dtype)[None, None, :, None] + jnp.einsum(
                        "ph,bcpw->bchw", jnp.asarray(onehot, t_p.dtype), t_pp.astype(t_p.dtype)
                    )
                phase_outputs.append(t_p)

            t = jnp.stack(phase_outputs, axis=-1).reshape(B, Cp, Hout, Wout)
            return acc + t.astype(jnp.float32), None

        xs = (wk, psi_band, psi_pol) if self.polar_rows else (wk, psi_band)
        y, _ = jax.lax.scan(body, jnp.zeros((B, Cp, Hout, Wout), jnp.float32), xs)
        return y
