"""Complex-valued activations for spectral-space nonlinearities.

Functional equivalents of the reference's activation zoo
(``makani/models/common/activations.py:20-263``), used by the nonlinear
spectral filters which apply MLPs to complex SH coefficients. A complex number
has no total order, so "ReLU" admits several generalizations, selected by
``mode``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["complex_relu", "ComplexReLU", "ComplexActivation", "magnitude_preserving_silu"]


def complex_relu(z: jnp.ndarray, mode: str = "real", negative_slope: float = 0.0, bias=0.0) -> jnp.ndarray:
    """Complex rectifier. Modes: "real", "cartesian", "modulus", "halfplane"."""
    act = lambda v: jnp.where(v >= 0, v, negative_slope * v)
    if mode == "real":
        return jax.lax.complex(act(z.real), z.imag)
    if mode == "cartesian":
        return jax.lax.complex(act(z.real), act(z.imag))
    if mode == "modulus":
        zabs = jnp.sqrt(jnp.square(z.real) + jnp.square(z.imag))
        gated = jnp.where(zabs + bias > 0, (zabs + bias) / jnp.maximum(zabs, 1e-30), 0.0)
        return z * gated.astype(z.dtype)
    if mode == "halfplane":
        angle = jnp.angle(z) - bias
        keep = jnp.logical_and(0.0 <= angle, angle < jnp.pi / 2.0)
        return jnp.where(keep, z, negative_slope * z)
    raise NotImplementedError(f"Unknown complex ReLU mode {mode}")


class ComplexReLU(nn.Module):
    """Complex rectifier with (for modulus/halfplane modes) a learnable bias."""

    negative_slope: float = 0.0
    mode: str = "real"
    bias_shape: tuple | None = None
    scale: float = 1.0

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.mode in ("modulus", "halfplane"):
            shape = self.bias_shape if self.bias_shape is not None else (1,)
            bias = self.param("bias", lambda _key: jnp.full(shape, self.scale, dtype=jnp.float32))
        else:
            bias = 0.0
        return complex_relu(z, mode=self.mode, negative_slope=self.negative_slope, bias=bias)


class ComplexActivation(nn.Module):
    """Lift a real activation to complex inputs ("cartesian" or "modulus")."""

    activation: callable = jax.nn.gelu
    mode: str = "cartesian"
    bias_shape: tuple | None = None

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "cartesian":
            return jax.lax.complex(self.activation(z.real), self.activation(z.imag))
        if self.mode == "modulus":
            shape = self.bias_shape if self.bias_shape is not None else (1,)
            bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
            zabs = jnp.sqrt(jnp.square(z.real) + jnp.square(z.imag))
            return (self.activation(zabs + bias) * jnp.exp(1.0j * jnp.angle(z))).astype(z.dtype)
        return z


def complex_relu_s(z2: jnp.ndarray, mode: str = "real", negative_slope: float = 0.0, bias=0.0) -> jnp.ndarray:
    """Split-complex rectifier: z2 has a trailing [re, im] axis (no complex
    dtype; see contractions.py)."""
    act = lambda v: jnp.where(v >= 0, v, negative_slope * v)
    zr, zi = z2[..., 0], z2[..., 1]
    if mode == "real":
        return jnp.stack([act(zr), zi], axis=-1)
    if mode == "cartesian":
        return jnp.stack([act(zr), act(zi)], axis=-1)
    if mode == "modulus":
        zabs = jnp.sqrt(jnp.square(zr) + jnp.square(zi))
        gated = jnp.where(zabs + bias > 0, (zabs + bias) / jnp.maximum(zabs, 1e-30), 0.0)
        return z2 * gated[..., None]
    if mode == "halfplane":
        angle = jnp.arctan2(zi, zr) - bias
        keep = jnp.logical_and(0.0 <= angle, angle < jnp.pi / 2.0)
        return jnp.where(keep[..., None], z2, negative_slope * z2)
    raise NotImplementedError(f"Unknown complex ReLU mode {mode}")


def magnitude_preserving_silu(x: jnp.ndarray, normalization_factor: float = 0.596) -> jnp.ndarray:
    """SiLU rescaled to preserve unit variance for N(0,1) input."""
    return jax.nn.silu(x) / normalization_factor
