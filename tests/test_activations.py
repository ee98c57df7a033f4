"""Complex activation zoo (ref tests/test_activations.py: each complex
rectifier mode against explicit definitions, the split-complex twins, the
learnable-bias module variants, and the magnitude-preserving scaling).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.common.activations import (
    ComplexActivation,
    ComplexReLU,
    complex_relu,
    complex_relu_s,
    magnitude_preserving_silu,
)


def _z(seed=0, shape=(4, 6)):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


class TestComplexReLU:
    def test_real_mode(self):
        z = _z()
        out = np.asarray(complex_relu(jnp.asarray(z), mode="real"))
        np.testing.assert_allclose(out.real, np.maximum(z.real, 0.0), atol=1e-7)
        np.testing.assert_allclose(out.imag, z.imag, atol=1e-7)

    def test_cartesian_mode_with_leak(self):
        z = _z(1)
        slope = 0.2
        out = np.asarray(complex_relu(jnp.asarray(z), mode="cartesian", negative_slope=slope))
        want_re = np.where(z.real >= 0, z.real, slope * z.real)
        want_im = np.where(z.imag >= 0, z.imag, slope * z.imag)
        np.testing.assert_allclose(out.real, want_re, atol=1e-7)
        np.testing.assert_allclose(out.imag, want_im, atol=1e-7)

    def test_modulus_mode_preserves_phase(self):
        z = _z(2)
        bias = -0.5
        out = np.asarray(complex_relu(jnp.asarray(z), mode="modulus", bias=bias))
        r = np.abs(z)
        keep = r + bias > 0
        # amplitude shrinks by |bias|, phase untouched; fully gated below
        np.testing.assert_allclose(np.abs(out)[keep], (r + bias)[keep], rtol=1e-5)
        np.testing.assert_allclose(np.angle(out)[keep], np.angle(z)[keep], atol=1e-5)
        np.testing.assert_array_equal(out[~keep], 0.0)

    def test_halfplane_mode(self):
        # unit-phase probes in each quadrant: only [0, pi/2) survives
        angles = np.asarray([0.1, 1.0, 2.0, -1.0, 3.0, -2.5])
        z = np.exp(1j * angles).astype(np.complex64)
        out = np.asarray(complex_relu(jnp.asarray(z), mode="halfplane", negative_slope=0.0))
        keep = (angles >= 0) & (angles < np.pi / 2)
        np.testing.assert_allclose(out[keep], z[keep], atol=1e-6)
        np.testing.assert_array_equal(out[~keep], 0.0)

    def test_unknown_mode_raises(self):
        with pytest.raises(NotImplementedError):
            complex_relu(jnp.asarray(_z()), mode="polar")


@pytest.mark.parametrize("mode", ["real", "cartesian", "modulus", "halfplane"])
def test_split_complex_matches_complex(mode):
    """complex_relu_s on a trailing [re, im] axis == complex_relu on the
    complex dtype (the split-complex convention of the spectral path)."""
    z = _z(3)
    z2 = jnp.stack([jnp.asarray(z.real), jnp.asarray(z.imag)], axis=-1)
    kwargs = dict(negative_slope=0.1, bias=-0.2) if mode in ("modulus", "halfplane") else dict(negative_slope=0.1)
    want = np.asarray(complex_relu(jnp.asarray(z), mode=mode, **kwargs))
    got = np.asarray(complex_relu_s(z2, mode=mode, **kwargs))
    np.testing.assert_allclose(got[..., 0], want.real, atol=1e-6)
    np.testing.assert_allclose(got[..., 1], want.imag, atol=1e-6)


class TestModules:
    def test_complex_relu_module_learnable_bias(self):
        m = ComplexReLU(mode="modulus", bias_shape=(1,), scale=0.7)
        z = jnp.asarray(_z(4))
        params = m.init(jax.random.PRNGKey(0), z)
        assert params["params"]["bias"].shape == (1,)
        np.testing.assert_allclose(np.asarray(params["params"]["bias"]), 0.7)
        out = m.apply(params, z)
        want = complex_relu(z, mode="modulus", bias=params["params"]["bias"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)

    def test_complex_relu_module_real_has_no_params(self):
        m = ComplexReLU(mode="real")
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(_z()))
        assert not params.get("params", {})

    def test_complex_activation_cartesian(self):
        m = ComplexActivation(activation=jax.nn.gelu, mode="cartesian")
        z = jnp.asarray(_z(5))
        out = m.apply(m.init(jax.random.PRNGKey(0), z), z)
        np.testing.assert_allclose(np.asarray(out.real), np.asarray(jax.nn.gelu(z.real)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.imag), np.asarray(jax.nn.gelu(z.imag)), atol=1e-6)

    def test_complex_activation_modulus_preserves_phase(self):
        m = ComplexActivation(activation=jax.nn.sigmoid, mode="modulus")
        z = jnp.asarray(_z(6))
        out = np.asarray(m.apply(m.init(jax.random.PRNGKey(0), z), z))
        zn = np.asarray(z)
        np.testing.assert_allclose(np.abs(out), np.asarray(jax.nn.sigmoid(jnp.abs(z))), atol=1e-5)
        # phase preserved where the magnitude is nonzero
        np.testing.assert_allclose(np.angle(out), np.angle(zn), atol=1e-5)


def test_magnitude_preserving_silu_unit_variance():
    """For N(0,1) input the rescaled SiLU has ~unit second moment (the
    0.596 factor is the analytic RMS of silu under the standard normal)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(200_000).astype(np.float32))
    y = np.asarray(magnitude_preserving_silu(x))
    assert abs(np.mean(y**2) - 1.0) < 0.02
    # and it is exactly silu/0.596
    np.testing.assert_allclose(y, np.asarray(jax.nn.silu(x)) / 0.596, rtol=1e-6)
