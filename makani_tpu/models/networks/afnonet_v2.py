"""AFNO v2 — channels-first restructured AFNO (flax.linen).

Re-implementation of the reference ``makani/models/networks/afnonet_v2.py``:
same FFT -> block-diagonal complex MLP -> soft-shrink -> IFFT mixer as v1,
but operating channels-first with a cartesian complex ReLU, two-sided
truncation along the unhalved latitude-frequency axis, configurable skips
around the filter, and instance/layer norms instead of token LayerNorm.

Complex algebra is split re/im throughout (no complex dtype on device).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.common.activations import complex_relu_s
from makani_tpu.models.common.layer_norm import ChannelLayerNorm, InstanceNorm2d
from makani_tpu.models.common.layers import MLP, Conv1x1, DropPath, PatchEmbed2D
from makani_tpu.ops import fft_compat

__all__ = ["AFNO2Dv2", "AFNOv2Block", "AdaptiveFourierNeuralOperatorNetV2"]

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def _compl_mul_add_s(a2, w2):
    """(B, nb, bs, H, W, 2) x (nb, bs, out, 2) -> (B, nb, out, H, W, 2)."""
    rr = jnp.einsum("bkixy,kio->bkoxy", a2[..., 0], w2[..., 0])
    ii = jnp.einsum("bkixy,kio->bkoxy", a2[..., 1], w2[..., 1])
    ri = jnp.einsum("bkixy,kio->bkoxy", a2[..., 0], w2[..., 1])
    ir = jnp.einsum("bkixy,kio->bkoxy", a2[..., 1], w2[..., 0])
    return jnp.stack([rr - ii, ri + ir], axis=-1)


def _softshrink(x, lambd):
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lambd, 0.0)


class AFNO2Dv2(nn.Module):
    """Channels-first AFNO mixer (ref afnonet_v2.py:84-210)."""

    hidden_size: int
    num_blocks: int = 8
    sparsity_threshold: float = 0.0
    hard_thresholding_fraction: float = 1.0
    hidden_size_factor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nb = self.num_blocks
        bs = self.hidden_size // nb
        hf = self.hidden_size_factor
        init = nn.initializers.normal(stddev=0.02)
        w1 = self.param("w1", init, (nb, bs, bs * hf, 2), jnp.float32)
        b1 = self.param("b1", init, (1, nb * bs, 1, 1), jnp.float32)
        w2 = self.param("w2", init, (nb, bs * hf, bs, 2), jnp.float32)

        bias = x
        dtype = x.dtype
        B, C, H, W = x.shape
        Wh = W // 2 + 1
        tmH, tmW = H // 2 + 1, Wh
        kH = int(tmH * self.hard_thresholding_fraction)
        kW = int(tmW * self.hard_thresholding_fraction)

        xs = fft_compat.rfft2_s(x.astype(jnp.float32), axes=(-2, -1), norm="ortho")  # (B, C, H, Wh, 2)
        xs = xs.reshape(B, nb, bs, H, Wh, 2)

        def mixer(v):
            h = complex_relu_s(_compl_mul_add_s(v, w1), mode="cartesian")
            return _compl_mul_add_s(h, w2)

        if kH == tmH and kW == tmW:
            out = mixer(xs)
        else:
            # two-sided truncation along H (positive+negative frequencies),
            # one-sided along W; untouched modes are zero
            lo = mixer(xs[:, :, :, :kH, :kW])
            hi = mixer(xs[:, :, :, H - kH :, :kW])
            out = jnp.zeros_like(xs)
            out = out.at[:, :, :, :kH, :kW].set(lo)
            out = out.at[:, :, :, H - kH :, :kW].set(hi)

        out = _softshrink(out, self.sparsity_threshold)
        out = out.reshape(B, C, H, Wh, 2)
        y = fft_compat.irfft2_s(out, s=(H, W), axes=(-2, -1), norm="ortho").astype(dtype)
        return y + b1.astype(dtype) + bias


class AFNOv2Block(nn.Module):
    """Block with configurable filter skip (ref afnonet_v2.py:211-360)."""

    dim: int
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path: float = 0.0
    num_blocks: int = 8
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0
    skip_fno: Optional[str] = "linear"
    nested_skip_fno: bool = True
    normalization_layer: str = "instance_norm"
    dtype: Any = jnp.float32

    def _norm(self, name):
        if self.normalization_layer in ("instance_norm", "instance_norm_s2"):
            return InstanceNorm2d(num_features=self.dim, eps=1e-6, affine=True, dtype=self.dtype, name=name)
        if self.normalization_layer == "layer_norm":
            return ChannelLayerNorm(num_features=self.dim, eps=1e-6, affine=True, dtype=self.dtype, name=name)
        raise NotImplementedError(self.normalization_layer)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        x = self._norm("norm1")(x)
        x = AFNO2Dv2(
            self.dim,
            num_blocks=self.num_blocks,
            sparsity_threshold=self.sparsity_threshold,
            hard_thresholding_fraction=self.hard_thresholding_fraction,
            dtype=self.dtype,
            name="filter",
        )(x)

        if self.skip_fno == "linear":
            x = x + Conv1x1(self.dim, use_bias=True, kernel_std=0.02, dtype=self.dtype, name="skip_layer")(residual)
        elif self.skip_fno == "identity":
            x = x + residual
        if self.skip_fno is not None and not self.nested_skip_fno:
            residual = x

        x = self._norm("norm2")(x)
        x = MLP(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop_rate=self.drop_rate,
            dtype=self.dtype,
            name="mlp",
        )(x, deterministic=deterministic)
        if self.drop_path > 0:
            x = DropPath(self.drop_path)(x, deterministic=deterministic)
        return x + residual


class AdaptiveFourierNeuralOperatorNetV2(nn.Module):
    """AFNOv2 net (ref afnonet_v2.py:361-600)."""

    inp_shape: Tuple[int, int] = (720, 1440)
    out_shape: Tuple[int, int] = (720, 1440)
    patch_size: Sequence[int] = (6, 6)
    inp_chans: int = 2
    out_chans: int = 2
    embed_dim: int = 768
    num_layers: int = 12
    mlp_ratio: float = 4.0
    pos_drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    mlp_drop_rate: float = 0.0
    num_blocks: int = 16
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0
    skip_fno: Optional[str] = "linear"
    nested_skip_fno: bool = True
    normalization_layer: str = "instance_norm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, C, H, W = x.shape
        ph, pw = self.patch_size
        Hc, Wc = (H // ph) * ph, (W // pw) * pw
        x = x[:, :, :Hc, :Wc]
        h, w = Hc // ph, Wc // pw

        tokens = PatchEmbed2D(self.patch_size, self.embed_dim, dtype=self.dtype, name="patch_embed")(x)  # (B,E,h,w)
        pos = self.param("pos_embed", _trunc02, (1, self.embed_dim, h, w), jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)
        if self.pos_drop_rate > 0:
            tokens = nn.Dropout(self.pos_drop_rate)(tokens, deterministic=deterministic)

        dpr = np.linspace(0, self.path_drop_rate, self.num_layers)
        for i in range(self.num_layers):
            tokens = AFNOv2Block(
                self.embed_dim,
                mlp_ratio=self.mlp_ratio,
                drop_rate=self.mlp_drop_rate,
                drop_path=float(dpr[i]),
                num_blocks=self.num_blocks,
                sparsity_threshold=self.sparsity_threshold,
                hard_thresholding_fraction=self.hard_thresholding_fraction,
                skip_fno=self.skip_fno,
                nested_skip_fno=self.nested_skip_fno,
                normalization_layer=self.normalization_layer,
                dtype=self.dtype,
                name=f"block{i}",
            )(tokens, deterministic=deterministic)

        y = Conv1x1(self.out_chans * ph * pw, use_bias=False, kernel_std=0.02, dtype=self.dtype, name="head")(tokens)
        # unfold patches: layout matches the reference head (afnonet_v2.py:570-600)
        y = y.reshape(B, ph, pw, self.out_chans, h, w)
        y = jnp.transpose(y, (0, 3, 4, 1, 5, 2)).reshape(B, self.out_chans, Hc, Wc)
        if Hc < H or Wc < W:
            y = jnp.pad(y, [(0, 0), (0, 0), (0, H - Hc), (0, W - Wc)])
        return y
