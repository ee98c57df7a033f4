"""Spherical Neural Operator (SNO) — flax.linen.

Re-implementation of the reference SNO (``makani/models/networks/snonet.py:
50-908``), the single-channel-group precursor of FourCastNet 3: a DISCO
encoder lifts the full channel stack onto the internal grid, a processor of
neural-operator blocks alternates global spectral and local DISCO
convolutions (block norm applied *after* the convolution, no pre-norm —
snonet.py:539-556), and a DISCO decoder with bilinear upsampling projects
back; optional big-skip residual.

Reuses FCN3's encoder/decoder/block components with a single channel group.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.common.layers import Conv1x1
from makani_tpu.models.networks.fourcastnet3 import (
    DiscreteContinuousDecoder,
    DiscreteContinuousEncoder,
    FCN3Block,
)
from makani_tpu.models.networks.sfnonet import _ACTIVATIONS, build_spectral_transforms

__all__ = ["SphericalNeuralOperatorNet"]


class SphericalNeuralOperatorNet(nn.Module):
    model_grid_type: str = "equiangular"
    sht_grid_type: str = "legendre-gauss"
    inp_shape: Tuple[int, int] = (721, 1440)
    out_shape: Tuple[int, int] = (721, 1440)
    inp_chans: int = 2
    out_chans: int = 2
    embed_dim: int = 32
    num_layers: int = 4
    scale_factor: int = 8
    kernel_shape: Sequence[int] = (3, 4)
    encoder_kernel_shape: Sequence[int] = (3, 4)
    filter_basis_type: str = "harmonic"
    filter_basis_norm_mode: str = "mean"
    encoder_mlp: bool = False
    num_groups: int = 1
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    activation_function: str = "gelu"
    layer_scale: bool = True
    pos_drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    mlp_drop_rate: float = 0.0
    normalization_layer: str = "instance_norm"
    max_modes: Optional[Tuple[int, int]] = None
    hard_thresholding_fraction: float = 1.0
    sfno_block_frequency: int = 2
    big_skip: bool = True
    use_bias: bool = False
    upsample_sht: bool = False
    # channels-last processor (see fourcastnet3.py FCN3Block flag)
    channels_last: bool = True
    checkpointing_level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = _ACTIVATIONS[self.activation_function]
        h = int(self.inp_shape[0] // self.scale_factor)
        w = int(self.inp_shape[1] // self.scale_factor)

        if self.max_modes is not None:
            modes = tuple(self.max_modes)
        else:
            modes = (int(h * self.hard_thresholding_fraction), int((w // 2 + 1) * self.hard_thresholding_fraction))

        _, _, sht, isht = build_spectral_transforms(
            "sht", (h, w), (h, w), (h, w), modes, self.sht_grid_type, self.sht_grid_type
        )

        # lat-padded inputs: run on logical rows, pad the output back
        pad_h = x.shape[-2] - self.inp_shape[0]
        if pad_h > 0:
            x = x[..., : self.inp_shape[0], :]

        if self.big_skip:
            residual = x[:, : self.out_chans]

        z = DiscreteContinuousEncoder(
            self.inp_shape,
            (h, w),
            self.inp_chans,
            self.embed_dim,
            grid_in=self.model_grid_type,
            grid_out=self.sht_grid_type,
            kernel_shape=tuple(self.encoder_kernel_shape),
            basis_type=self.filter_basis_type,
            basis_norm_mode=self.filter_basis_norm_mode,
            use_mlp=self.encoder_mlp,
            act_layer=act,
            groups=1,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="encoder",
        )(x)

        if self.pos_drop_rate > 0:
            z = nn.Dropout(self.pos_drop_rate)(z, deterministic=deterministic)

        cl = self.channels_last
        if cl:
            z = jnp.transpose(z, (0, 2, 3, 1))
        dpr = np.linspace(0, self.path_drop_rate, self.num_layers)
        for i in range(self.num_layers):
            conv_type = "global" if i % self.sfno_block_frequency == 0 else "local"
            z = FCN3Block(
                sht,
                isht,
                self.embed_dim,
                self.embed_dim,
                conv_type=conv_type,
                internal_shape=(h, w),
                grid_type=self.sht_grid_type,
                mlp_ratio=self.mlp_ratio,
                mlp_drop_rate=self.mlp_drop_rate,
                path_drop_rate=float(dpr[i]),
                act_layer=act,
                normalization_layer=self.normalization_layer,
                num_groups=self.num_groups,
                skip="identity",
                layer_scale=self.layer_scale,
                use_mlp=self.use_mlp,
                kernel_shape=tuple(self.kernel_shape),
                basis_type=self.filter_basis_type,
                basis_norm_mode=self.filter_basis_norm_mode,
                use_bias=self.use_bias,
                channels_last=cl,
                dtype=self.dtype,
                name=f"block{i}",
            )(z, deterministic=deterministic)
        if cl:
            z = jnp.transpose(z, (0, 3, 1, 2))

        y = DiscreteContinuousDecoder(
            (h, w),
            self.out_shape,
            self.embed_dim,
            self.out_chans,
            grid_in=self.sht_grid_type,
            grid_out=self.model_grid_type,
            kernel_shape=tuple(self.encoder_kernel_shape),
            basis_type=self.filter_basis_type,
            basis_norm_mode=self.filter_basis_norm_mode,
            use_mlp=self.encoder_mlp,
            act_layer=act,
            groups=1,
            use_bias=self.use_bias,
            upsample_sht=self.upsample_sht,
            dtype=self.dtype,
            name="decoder",
        )(z)

        if self.big_skip:
            y = y + Conv1x1(
                self.out_chans,
                use_bias=False,
                kernel_std=math.sqrt(0.5 / self.out_chans),
                dtype=self.dtype,
                name="residual_transform",
            )(residual)

        if pad_h > 0:
            y = jnp.pad(y, [(0, 0), (0, 0), (0, pad_h), (0, 0)])
        return y
