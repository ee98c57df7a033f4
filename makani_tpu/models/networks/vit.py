"""Vision Transformer baseline (ref makani/models/networks/vit.py:27-467).

Standard pre-norm ViT on patch tokens of the lat-lon grid: patch embed ->
N x (LayerNorm -> MHA -> +skip -> LayerNorm -> MLP -> +skip) -> LayerNorm ->
linear head unfolding tokens back into patches.

Attention uses one fused qkv projection; on TPU the (B, heads, N, hd)
einsums map straight onto the MXU, and head-sharded tensor parallelism falls
out of a PartitionSpec over the head dimension ("matmul" axis) — the
reference's DistributedAttention (mpu/layers.py:960-1091) is a sharding rule
here, not a module.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.common.layers import DropPath, PatchEmbed2D

__all__ = ["Attention", "ViTBlock", "VisionTransformer"]

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class Attention(nn.Module):
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        if C % self.num_heads != 0:
            raise ValueError(f"dim {C} not divisible by num_heads {self.num_heads}")
        hd = C // self.num_heads

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, kernel_init=_trunc02, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd).astype(x.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        if self.attn_drop_rate > 0:
            attn = nn.Dropout(self.attn_drop_rate)(attn, deterministic=deterministic)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        y = nn.Dense(C, kernel_init=_trunc02, dtype=self.dtype, name="proj")(y)
        if self.proj_drop_rate > 0:
            y = nn.Dropout(self.proj_drop_rate)(y, deterministic=deterministic)
        return y


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        h = Attention(
            self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop_rate=self.attn_drop_rate,
            proj_drop_rate=self.drop_rate,
            dtype=self.dtype,
            name="attn",
        )(h, deterministic=deterministic)
        if self.drop_path > 0:
            h = DropPath(self.drop_path)(h, deterministic=deterministic)
        x = x + h

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), kernel_init=_trunc02, dtype=self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        if self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, kernel_init=_trunc02, dtype=self.dtype)(h)
        if self.drop_path > 0:
            h = DropPath(self.drop_path)(h, deterministic=deterministic)
        return x + h


class VisionTransformer(nn.Module):
    inp_shape: Tuple[int, int] = (720, 1440)
    out_shape: Tuple[int, int] = (720, 1440)
    patch_size: Sequence[int] = (16, 16)
    inp_chans: int = 2
    out_chans: int = 2
    embed_dim: int = 768
    num_layers: int = 12
    depth: int | None = None
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    pos_drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    mlp_drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, C, H, W = x.shape
        ph, pw = self.patch_size
        Hc, Wc = (H // ph) * ph, (W // pw) * pw
        x = x[:, :, :Hc, :Wc]
        h, w = Hc // ph, Wc // pw
        depth = self.depth or self.num_layers

        tokens = PatchEmbed2D(self.patch_size, self.embed_dim, flatten=True, dtype=self.dtype, name="patch_embed")(x)
        pos = self.param("pos_embed", _trunc02, (1, h * w, self.embed_dim), jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)
        if self.pos_drop_rate > 0:
            tokens = nn.Dropout(self.pos_drop_rate)(tokens, deterministic=deterministic)

        dpr = np.linspace(0, self.path_drop_rate, depth)
        for i in range(depth):
            tokens = ViTBlock(
                self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop_rate=self.mlp_drop_rate,
                attn_drop_rate=self.attn_drop_rate,
                drop_path=float(dpr[i]),
                dtype=self.dtype,
                name=f"block{i}",
            )(tokens, deterministic=deterministic)

        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(tokens)

        y = nn.Dense(self.out_chans * ph * pw, kernel_init=_trunc02, dtype=self.dtype, name="head")(tokens)
        y = y.reshape(B, h, w, ph, pw, self.out_chans)
        y = jnp.transpose(y, (0, 5, 1, 3, 2, 4)).reshape(B, self.out_chans, Hc, Wc)
        if Hc < H or Wc < W:
            y = jnp.pad(y, [(0, 0), (0, 0), (0, H - Hc), (0, W - Wc)])
        return y
