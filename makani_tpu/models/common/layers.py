"""Pointwise building blocks (flax.linen).

TPU-native equivalents of the reference's serial building blocks
(``makani/models/common/layers.py``): the 1x1-conv MLP, the encoder/decoder
stack, stochastic depth, layer scale, and patch embed/recovery. The data
layout is NCHW — every "conv" here is a pure channel contraction expressed as
an einsum, which XLA maps onto the MXU with (B, H, W) as free dimensions; the
spatial dims stay last so spectral transforms apply without transposes.

Initialization matches the reference: He fan-in normal on hidden layers,
``gain/fan_in`` variance on output projections so callers can damp a block's
initial contribution (layers.py:615-641, 788-793).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Conv1x1", "MLP", "EncoderDecoder", "DropPath", "LayerScale", "PatchEmbed2D", "PatchRecovery2D"]


def _normal(std: float):
    return nn.initializers.normal(stddev=std)


class Conv1x1(nn.Module):
    """Pointwise channel mixing: x (B,C,H,W) -> (B,O,H,W), or channels-last
    (B,H,W,C) -> (B,H,W,O).

    Equivalent to ``nn.Conv2d(C, O, 1)``; expressed as an einsum so the MXU
    contraction and layout are explicit. Supports grouped mixing. The input is
    cast to the compute dtype (the reference's autocast puts these GEMMs on
    bf16 tensor cores; without the cast a mixed fp32xbf16 einsum silently
    promotes to an fp32 matmul). Channels-last keeps the contracting channel
    dim minormost, which XLA consumes without a relayout copy — measured 1.6x
    faster at 0.25 deg (PERF.md).
    """

    features: int
    use_bias: bool = True
    groups: int = 1
    kernel_std: float | None = None  # defaults to He: sqrt(2/fan_in)
    channels_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1] if self.channels_last else x.shape[1]
        g = self.groups
        if cin % g != 0 or self.features % g != 0:
            raise ValueError(f"channels ({cin}->{self.features}) not divisible by groups ({g})")
        fan_in = cin // g
        std = self.kernel_std if self.kernel_std is not None else math.sqrt(2.0 / fan_in)
        kernel = self.param("kernel", _normal(std), (g, fan_in, self.features // g), jnp.float32)
        x = x.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        # optional fp8 quantized matmul path (TE-recipe equivalent; hardware
        # fp8 on v6e+, emulated upcast elsewhere — ops/fp8.py)
        from makani_tpu.ops.fp8 import fp8_einsum, fp8_enabled

        def cmix(eq, xx):
            if fp8_enabled():
                return fp8_einsum(eq, xx, kernel, out_dtype=self.dtype)
            return jnp.einsum(eq, xx, kernel.astype(self.dtype))

        if self.channels_last:
            x = x.reshape(*x.shape[:-1], g, fan_in)
            y = cmix("...gi,gio->...go", x)
            y = y.reshape(*y.shape[:-2], self.features)
            if self.use_bias:
                y = y + bias.astype(self.dtype)
            return y
        x = x.reshape(x.shape[0], g, fan_in, *x.shape[2:])
        y = cmix("bgihw,gio->bgohw", x)
        y = y.reshape(y.shape[0], self.features, *y.shape[3:])
        if self.use_bias:
            y = y + bias.astype(self.dtype)[None, :, None, None]
        return y


class MLP(nn.Module):
    """Two-layer pointwise feed-forward block (ref layers.py:664-895).

    fc1 (He init) -> act -> drop -> fc2 (gain/fan_in init) -> drop. Dropout
    type "features" drops whole channels (Dropout2d semantics).
    """

    hidden_features: int
    out_features: int | None = None
    act_layer: Callable = jax.nn.gelu
    output_bias: bool = True
    drop_rate: float = 0.0
    drop_type: str = "iid"
    gain: float = 1.0
    channels_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_features = self.out_features or (x.shape[-1] if self.channels_last else x.shape[1])
        x = Conv1x1(self.hidden_features, use_bias=True, channels_last=self.channels_last, dtype=self.dtype, name="fc1")(x)
        x = self.act_layer(x)
        x = self._drop(x, deterministic)
        x = Conv1x1(
            out_features,
            use_bias=self.output_bias,
            kernel_std=math.sqrt(self.gain / self.hidden_features),
            channels_last=self.channels_last,
            dtype=self.dtype,
            name="fc2",
        )(x)
        x = self._drop(x, deterministic)
        return x

    def _drop(self, x, deterministic):
        if self.drop_rate <= 0.0:
            return x
        if self.drop_type == "iid":
            return nn.Dropout(rate=self.drop_rate)(x, deterministic=deterministic)
        if self.drop_type == "features":
            # drop whole channels: broadcast the mask over the spatial dims
            bdims = (1, 2) if self.channels_last else (2, 3)
            return nn.Dropout(rate=self.drop_rate, broadcast_dims=bdims)(x, deterministic=deterministic)
        raise NotImplementedError(f"Unknown drop_type {self.drop_type}")


class EncoderDecoder(nn.Module):
    """Stack of 1x1 conv + activation pairs ending in a bias-free projection
    (ref layers.py:537-661)."""

    num_layers: int
    output_dim: int
    hidden_dim: int
    act_layer: Callable = jax.nn.gelu
    gain: float = 1.0
    groups: int = 1
    channels_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = Conv1x1(
                self.hidden_dim, use_bias=True, groups=self.groups, channels_last=self.channels_last, dtype=self.dtype, name=f"hidden{i}"
            )(x)
            x = self.act_layer(x)
        fan_in = (x.shape[-1] if self.channels_last else x.shape[1]) // self.groups
        x = Conv1x1(
            self.output_dim,
            use_bias=False,
            groups=self.groups,
            kernel_std=math.sqrt(self.gain / fan_in),
            channels_last=self.channels_last,
            dtype=self.dtype,
            name="out",
        )(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample
    (ref layers.py:31-86)."""

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.drop_prob <= 0.0 or deterministic:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class LayerScale(nn.Module):
    """Learnable per-channel scaling of a residual branch (ref layers.py:154-196)."""

    num_chans: int
    init_value: float = 0.1
    channels_last: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", lambda _k: jnp.full((1, self.num_chans, 1, 1), self.init_value, jnp.float32))
        if self.channels_last:
            gamma = gamma.reshape(1, 1, 1, self.num_chans)
        return x * gamma.astype(x.dtype)


class PatchEmbed2D(nn.Module):
    """Non-overlapping patch embedding on NCHW input (ref layers.py:199-306).

    Splits the grid into (p_h, p_w) patches and linearly lifts each patch to
    ``embed_dim``: a strided conv, expressed as reshape + einsum so XLA sees a
    single large matmul.
    """

    patch_size: Sequence[int]
    embed_dim: int
    use_bias: bool = True
    flatten: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, C, H, W = x.shape
        ph, pw = self.patch_size
        if H % ph != 0 or W % pw != 0:
            raise ValueError(f"grid ({H},{W}) not divisible by patch size ({ph},{pw})")
        gh, gw = H // ph, W // pw
        fan_in = C * ph * pw
        kernel = self.param("kernel", _normal(math.sqrt(2.0 / fan_in)), (fan_in, self.embed_dim), jnp.float32)
        x = x.reshape(B, C, gh, ph, gw, pw)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(B, gh, gw, fan_in)
        y = jnp.einsum("bhwi,io->bhwo", x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32)
            y = y + bias.astype(self.dtype)
        if self.flatten:
            return y.reshape(B, gh * gw, self.embed_dim)
        return jnp.transpose(y, (0, 3, 1, 2))  # (B, embed, gh, gw)


class PatchRecovery2D(nn.Module):
    """Inverse of PatchEmbed2D: project embeddings back to per-pixel channels
    (ref layers.py:408-465)."""

    patch_size: Sequence[int]
    out_chans: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, embed, gh, gw)
        B, E, gh, gw = x.shape
        ph, pw = self.patch_size
        fan_out = self.out_chans * ph * pw
        kernel = self.param("kernel", _normal(math.sqrt(1.0 / E)), (E, fan_out), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (fan_out,), jnp.float32)
        y = jnp.einsum("behw,eo->bhwo", x, kernel.astype(self.dtype)) + bias.astype(self.dtype)
        y = y.reshape(B, gh, gw, self.out_chans, ph, pw)
        y = jnp.transpose(y, (0, 3, 1, 4, 2, 5)).reshape(B, self.out_chans, gh * ph, gw * pw)
        return y
