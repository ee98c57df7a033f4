"""Split-complex contraction kernels and complex activations vs complex
numpy references (ref tests/test_contractions.py, test_activations.py).

Every split-complex kernel must equal the corresponding complex-arithmetic
computation done in numpy complex64; channels-last layouts must match
channels-first after transposition.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.models.common.activations import complex_relu, complex_relu_s, magnitude_preserving_silu
from makani_tpu.models.common.contractions import (
    cmul_einsum_s,
    compl_exp_mul2d_s,
    compl_mul2d_s,
    contract_dense_s,
)

B, G, CI, CO, L, M = 2, 2, 3, 4, 5, 6


def _split(c):
    return jnp.asarray(np.stack([c.real, c.imag], axis=-1).astype(np.float32))


def _join(s):
    s = np.asarray(s)
    return s[..., 0] + 1j * s[..., 1]


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def _cx(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


def test_cmul_einsum_matches_complex(rng):
    a = _cx(rng, (B, CI, L))
    w = _cx(rng, (CI, CO))
    got = _join(cmul_einsum_s("bil,io->bol", _split(a), _split(w)))
    want = np.einsum("bil,io->bol", a, w)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("operator_type", ["diagonal", "dhconv"])
@pytest.mark.parametrize("separable", [False, True])
def test_contract_dense_matches_complex(rng, operator_type, separable):
    x = _cx(rng, (B, G, CI, L, M))
    if operator_type == "diagonal":
        w = _cx(rng, (G, CI, L, M) if separable else (G, CI, CO, L, M))
        eq = "bgixy,gixy->bgixy" if separable else "bgixy,gioxy->bgoxy"
    else:
        w = _cx(rng, (G, CI, L) if separable else (G, CI, CO, L))
        eq = "bgixy,gix->bgixy" if separable else "bgixy,giox->bgoxy"
    got = _join(contract_dense_s(_split(x), _split(w), separable=separable, operator_type=operator_type))
    want = np.einsum(eq.replace("xy", "lm").replace("x", "l"), x, w)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # channels-last must equal channels-first after transposition
    x_cl = _split(np.moveaxis(x, (1, 2), (3, 4)))
    got_cl = _join(contract_dense_s(x_cl, _split(w), separable=separable, operator_type=operator_type, channels_last=True))
    np.testing.assert_allclose(np.moveaxis(got_cl, (3, 4), (1, 2)), want, atol=1e-5)


def test_compl_mul2d_variants(rng):
    x = _cx(rng, (B, CI, L, M))
    w = _cx(rng, (CI, CO))
    got = _join(compl_mul2d_s(_split(x), _split(w)))
    np.testing.assert_allclose(got, np.einsum("bilm,io->bolm", x, w), atol=1e-5)

    wl = _cx(rng, (L, CI, CO))
    got2 = _join(compl_exp_mul2d_s(_split(x), _split(wl)))
    np.testing.assert_allclose(got2, np.einsum("bilm,lio->bolm", x, wl), atol=1e-5)


@pytest.mark.parametrize("mode", ["real", "cartesian", "modulus", "halfplane"])
def test_complex_relu_modes(rng, mode):
    z = _cx(rng, (4, 7))
    got = np.asarray(complex_relu(jnp.asarray(z), mode=mode, bias=0.1 if mode in ("modulus", "halfplane") else 0.0))

    if mode == "real":
        # ReLU on the real part only, imaginary part passes through
        want = np.maximum(z.real, 0) + 1j * z.imag
    elif mode == "cartesian":
        want = np.maximum(z.real, 0) + 1j * np.maximum(z.imag, 0)
    elif mode == "modulus":
        mag = np.abs(z)
        want = None  # invariants checked below
    else:  # halfplane: keep the quadrant [0, pi/2) after a phase bias
        ang = np.angle(z) - 0.1
        keep = (0.0 <= ang) & (ang < np.pi / 2)
        want = np.where(keep, z, 0)

    if mode == "modulus":
        # only check the invariants: phase preserved, magnitude nonnegative
        nz = np.abs(got) > 1e-6
        np.testing.assert_allclose(np.angle(got[nz]), np.angle(z[nz]), atol=1e-4)
    else:
        np.testing.assert_allclose(got, want, atol=1e-5)

    # split form agrees with the complex form
    got_s = _join(complex_relu_s(_split(z), mode=mode, bias=0.1 if mode in ("modulus", "halfplane") else 0.0))
    np.testing.assert_allclose(got_s, got, atol=1e-5)


def test_magnitude_preserving_silu_unit_magnitude():
    """The 0.596 factor normalizes the second moment (the EDM2 magnitude
    convention): E[silu(x)^2]/0.596^2 ~ 1 for N(0,1) input."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(200_000).astype(np.float32))
    y = np.asarray(magnitude_preserving_silu(x))
    assert abs(float(np.mean(np.square(y))) - 1.0) < 0.05
