"""FourCastNet 3 (probabilistic spherical neural operator) — flax.linen.

Re-implementation of the reference architecture
(``makani/models/networks/fourcastnet3.py:117-1135``):

  * channel-grouped DISCO encoders/decoders — every atmospheric pressure
    level runs through one shared encoder (batched over groups), plus a
    surface encoder and an auxiliary encoder,
  * a processor of neural-operator blocks alternating **local** DISCO
    convolutions and **global** spectral (SHT) convolutions
    (``sfno_block_frequency``), with auxiliary features re-concatenated
    before every block,
  * DISCO decoder with bilinear (or spectral) upsampling back to the data
    grid, soft water-channel clamping, and optional big-skip residual.

The DISCO contractions ride the TPU-native structured op
(`makani_tpu.ops.disco`); SHT blocks reuse the split-complex SpectralConv.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.common.layers import MLP, Conv1x1, DropPath, EncoderDecoder, LayerScale
from makani_tpu.models.common.layer_norm import ChannelLayerNorm, GeometricInstanceNormS2, InstanceNorm2d
from makani_tpu.models.common.spectral_convolution import SpectralConv
from makani_tpu.models.networks.sfnonet import _ACTIVATIONS, build_spectral_transforms
from makani_tpu.ops.disco import DiscoConvS2, compute_cutoff_radius, num_basis_functions
from makani_tpu.parallel.disco import make_disco_conv
from makani_tpu.ops.resample import ResampleS2
from makani_tpu.utils.features import get_channel_groups, get_water_channels

__all__ = ["DiscoConv", "DiscreteContinuousEncoder", "DiscreteContinuousDecoder", "FCN3Block", "AtmoSphericNeuralOperatorNet"]


def _soft_clamp(x, offset=0.0):
    """Smooth positive clamp (ref fourcastnet3.py:55-59)."""
    x = x + offset
    y = jnp.where(x > 0.0, jnp.square(x), 0.0)
    return jnp.where(x >= 0.5, x - 0.25, y)


class DiscoConv(nn.Module):
    """Learnable DISCO convolution: basis responses (ops.disco) + grouped
    channel mixing. Replaces torch-harmonics DiscreteContinuousConvS2."""

    conv_op: Any  # DiscoConvS2
    in_channels: int
    out_channels: int
    groups: int = 1
    use_bias: bool = False
    gain: float = 1.0
    channels_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.groups
        K = self.conv_op.K
        cin_g, cout_g = self.in_channels // g, self.out_channels // g
        # init std compensates the per-basis L1 response mass of the psi
        # tables (the smooth-input gain), so the conv output is O(<=1) at
        # init under ANY basis_norm_mode. For "mean"-normalized bases every
        # mass is 1 and this is exactly sqrt(gain / (cin*K)); for "nodal"
        # (FCN3.1's convention) the masses grow ~sqrt(support) and the
        # uncompensated init amplified ~3x per step (round-4 verdict).
        mass_sq = float(np.sum(np.square(getattr(self.conv_op, "init_mass", np.ones(K)))))
        std = math.sqrt(self.gain / (cin_g * max(mass_sq, 1e-12)))
        w = self.param("weight", nn.initializers.normal(stddev=std), (g, cout_g, cin_g, K), jnp.float32)

        xin = jnp.transpose(x, (0, 3, 1, 2)) if self.channels_last else x
        cdt = getattr(self.conv_op, "compute_dtype", jnp.float32)

        # weight-fused path for channel-grouped convs (encoders/decoders):
        # the (B, C, K, Hout, Wout) response tensor never materializes
        if getattr(self.conv_op, "supports_fused", False) and g * cout_g * cin_g <= 4096:
            y = self.conv_op.fused(xin.astype(cdt), w)
            if self.channels_last:
                y = jnp.transpose(y, (0, 2, 3, 1))
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
                y = y + (bias if self.channels_last else bias[None, :, None, None])
            return y.astype(x.dtype)

        # mix-first path for full-channel-mixing convs (processor blocks):
        # channel mixing runs before the basis convs under a scan over k, so
        # the (B, C, K, H, W) response tensor never materializes (same FLOPs;
        # ops/disco.py mix_first). OPT-IN (MAKANI_DISCO_MIX_FIRST=1): the
        # compiled scan program crashed the TPU worker process on two
        # separate runs of the published FCN3 recipe (PERF.md round 4),
        # while the two-stage path ran clean at the measured 0.2509.
        if getattr(self.conv_op, "supports_fused", False) and os.environ.get("MAKANI_DISCO_MIX_FIRST", "0") == "1":
            y = self.conv_op.mix_first(xin.astype(cdt), w)
            if self.channels_last:
                y = jnp.transpose(y, (0, 2, 3, 1))
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
                y = y + (bias if self.channels_last else bias[None, :, None, None])
            return y.astype(x.dtype)

        # two-stage path with the polar rows kept separate: mixing BEFORE the
        # polar insert means the one-hot scatter runs on the (B, Cout, P, W)
        # mixed rows, not the K-times-larger (B, C, K, H, W) response tensor
        # (the pre-mix insert dragged a ~10 ms transposed 790 MB layout copy
        # per FCN3 processor block on hardware; PERF.md round 4)
        if getattr(self.conv_op, "supports_split", False):
            t, t_pol = self.conv_op.call_split(xin.astype(cdt))
        else:
            t, t_pol = self.conv_op(xin.astype(cdt)), None  # (B, C, K, Hout, Wout)
        B, C, _, Ho, Wo = t.shape
        tg = t.reshape(B, g, cin_g, K, Ho, Wo)
        w = w.astype(t.dtype)
        if self.channels_last:
            # contract straight into channels-last: the (h*w, o) GEMM keeps
            # channels on the minor axis for the surrounding CL layers
            y = jnp.einsum("bgikhw,goik->bhwgo", tg, w).reshape(B, Ho, Wo, self.out_channels)
        else:
            y = jnp.einsum("bgikhw,goik->bgohw", tg, w).reshape(B, self.out_channels, Ho, Wo)
        if t_pol is not None:
            rows = np.asarray(self.conv_op.polar_rows)
            onehot = np.zeros((len(rows), Ho), np.float32)
            onehot[np.arange(len(rows)), rows] = 1.0
            tp = t_pol.reshape(B, g, cin_g, K, len(rows), Wo)
            if self.channels_last:
                y_pol = jnp.einsum("bgikpw,goik->bpwgo", tp, w).reshape(B, len(rows), Wo, self.out_channels)
                y = y + jnp.einsum("ph,bpwc->bhwc", jnp.asarray(onehot, y.dtype), y_pol)
            else:
                y_pol = jnp.einsum("bgikpw,goik->bgopw", tp, w).reshape(B, self.out_channels, len(rows), Wo)
                y = y + jnp.einsum("ph,bcpw->bchw", jnp.asarray(onehot, y.dtype), y_pol)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            y = y + (bias if self.channels_last else bias[None, :, None, None])
        return y.astype(x.dtype)


class DiscreteContinuousEncoder(nn.Module):
    """DISCO conv from the data grid onto the model grid
    (ref fourcastnet3.py:117-253)."""

    inp_shape: Tuple[int, int]
    out_shape: Tuple[int, int]
    inp_chans: int
    out_chans: int
    grid_in: str = "equiangular"
    grid_out: str = "equiangular"
    kernel_shape: Sequence[int] = (3, 3)
    basis_type: str = "piecewise linear"
    basis_norm_mode: str = "mean"
    use_mlp: bool = False
    mlp_ratio: float = 2.0
    act_layer: Callable = jax.nn.gelu
    groups: int = 1
    use_bias: bool = False
    theta_cutoff: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        theta_cutoff = self.theta_cutoff or compute_cutoff_radius(self.inp_shape[0], self.kernel_shape, self.basis_type)
        conv_op = make_disco_conv(
            self.inp_shape,
            self.out_shape,
            tuple(self.kernel_shape),
            basis_type=self.basis_type,
            basis_norm_mode=self.basis_norm_mode,
            grid_in=self.grid_in,
            grid_out=self.grid_out,
            theta_cutoff=theta_cutoff,
        )
        gain = 2.0 if self.use_mlp else 1.0
        x = DiscoConv(
            conv_op,
            self.inp_chans,
            self.out_chans,
            groups=self.groups,
            use_bias=self.use_bias,
            gain=gain,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_mlp:
            x = self.act_layer(x)
            x = EncoderDecoder(
                num_layers=1,
                output_dim=self.out_chans,
                hidden_dim=int(self.mlp_ratio * self.out_chans),
                act_layer=self.act_layer,
                dtype=self.dtype,
                name="mlp",
            )(x)
        return x


class DiscreteContinuousDecoder(nn.Module):
    """Upsample (bilinear or spectral) then DISCO conv back to the data grid
    (ref fourcastnet3.py:256-420)."""

    inp_shape: Tuple[int, int]
    out_shape: Tuple[int, int]
    inp_chans: int
    out_chans: int
    grid_in: str = "legendre-gauss"
    grid_out: str = "equiangular"
    kernel_shape: Sequence[int] = (3, 3)
    basis_type: str = "piecewise linear"
    basis_norm_mode: str = "mean"
    use_mlp: bool = False
    mlp_ratio: float = 2.0
    act_layer: Callable = jax.nn.gelu
    groups: int = 1
    use_bias: bool = False
    upsample_sht: bool = False
    theta_cutoff: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_mlp:
            x = self.act_layer(x)
            x = EncoderDecoder(
                num_layers=1,
                output_dim=self.inp_chans,
                hidden_dim=int(self.mlp_ratio * self.inp_chans),
                act_layer=self.act_layer,
                gain=2.0,
                dtype=self.dtype,
                name="mlp",
            )(x)

        dtype = x.dtype
        x = x.astype(jnp.float32)
        if self.upsample_sht:
            from makani_tpu.ops.sht import InverseRealSHT, RealSHT

            sht = RealSHT(*self.inp_shape, grid=self.grid_in)
            isht = InverseRealSHT(*self.out_shape, lmax=sht.lmax, mmax=sht.mmax, grid=self.grid_out)
            x = isht.synthesis(sht.analysis(x))
        else:
            from makani_tpu.parallel.resample import make_resample

            resample = make_resample(*self.inp_shape, *self.out_shape, grid_in=self.grid_in, grid_out=self.grid_out)
            x = resample(x)

        theta_cutoff = self.theta_cutoff or compute_cutoff_radius(self.out_shape[0], self.kernel_shape, self.basis_type)
        conv_op = make_disco_conv(
            self.out_shape,
            self.out_shape,
            tuple(self.kernel_shape),
            basis_type=self.basis_type,
            basis_norm_mode=self.basis_norm_mode,
            grid_in=self.grid_out,
            grid_out=self.grid_out,
            theta_cutoff=theta_cutoff,
        )
        x = DiscoConv(
            conv_op, self.inp_chans, self.out_chans, groups=self.groups, use_bias=False, dtype=jnp.float32, name="conv"
        )(x)
        return x.astype(dtype)


class FCN3Block(nn.Module):
    """FCN3 processor block: norm -> local DISCO / global spectral conv ->
    norm -> MLP -> layer-scale + identity skip (ref fourcastnet3.py:420-638)."""

    forward_transform: Any
    inverse_transform: Any
    inp_chans: int
    out_chans: int
    conv_type: str = "local"
    internal_shape: Tuple[int, int] = (None, None)
    grid_type: str = "legendre-gauss"
    mlp_ratio: float = 2.0
    mlp_drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    act_layer: Callable = jax.nn.gelu
    normalization_layer: str = "none"
    num_groups: int = 1
    skip: str = "identity"
    layer_scale: bool = True
    use_mlp: bool = True
    kernel_shape: Sequence[int] = (3, 3)
    basis_type: str = "piecewise linear"
    basis_norm_mode: str = "mean"
    use_bias: bool = False
    theta_cutoff: Optional[float] = None
    channels_last: bool = False
    dtype: Any = jnp.float32

    def _norm(self, name):
        if self.normalization_layer == "none":
            return None
        if self.normalization_layer == "instance_norm":
            return InstanceNorm2d(num_features=self.inp_chans, eps=1e-6, affine=True, channels_last=self.channels_last, dtype=self.dtype, name=name)
        if self.normalization_layer == "instance_norm_s2":
            return GeometricInstanceNormS2(
                img_shape=self.internal_shape,
                grid_type="legendre-gauss" if self.grid_type == "legendre-gauss" else "equiangular",
                num_features=self.inp_chans,
                eps=1e-6,
                affine=True,
                channels_last=self.channels_last,
                dtype=self.dtype,
                name=name,
            )
        if self.normalization_layer == "layer_norm":
            return ChannelLayerNorm(num_features=self.inp_chans, eps=1e-6, affine=True, channels_last=self.channels_last, dtype=self.dtype, name=name)
        raise NotImplementedError(f"normalization {self.normalization_layer}")

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        norm1 = self._norm("norm1")
        if norm1 is not None:
            x = norm1(x)

        if self.conv_type == "global":
            dx, _ = SpectralConv(
                self.forward_transform,
                self.inverse_transform,
                self.inp_chans,
                self.inp_chans,
                num_groups=self.num_groups,
                operator_type="dhconv",
                use_bias=self.use_bias,
                channels_last=self.channels_last,
                dtype=self.dtype,
                name="global_conv",
            )(x)
        elif self.conv_type == "local":
            theta_cutoff = self.theta_cutoff or 2 * compute_cutoff_radius(self.internal_shape[0], self.kernel_shape, self.basis_type)
            conv_op = make_disco_conv(
                self.internal_shape,
                self.internal_shape,
                tuple(self.kernel_shape),
                basis_type=self.basis_type,
                basis_norm_mode=self.basis_norm_mode,
                grid_in=self.grid_type,
                grid_out=self.grid_type,
                theta_cutoff=theta_cutoff,
            )
            dx = DiscoConv(
                conv_op,
                self.inp_chans,
                self.inp_chans,
                groups=self.num_groups,
                channels_last=self.channels_last,
                dtype=self.dtype,
                name="local_conv",
            )(x)
        else:
            raise ValueError(f"Unknown convolution type {self.conv_type}")

        norm2 = self._norm("norm2")
        if norm2 is not None:
            dx = norm2(dx)

        if self.use_mlp:
            dx = MLP(
                hidden_features=int(self.inp_chans * self.mlp_ratio),
                out_features=self.out_chans,
                act_layer=self.act_layer,
                drop_rate=self.mlp_drop_rate,
                drop_type="features",
                channels_last=self.channels_last,
                dtype=self.dtype,
                name="mlp",
            )(dx, deterministic=deterministic)

        if self.path_drop_rate > 0:
            dx = DropPath(self.path_drop_rate, name="drop_path")(dx, deterministic=deterministic)

        if self.layer_scale:
            dx = LayerScale(self.out_chans, channels_last=self.channels_last, name="layer_scale")(dx)

        xs = x[..., : self.out_chans] if self.channels_last else x[:, : self.out_chans]
        if self.skip == "identity":
            return xs + dx
        if self.skip == "linear":
            return Conv1x1(self.out_chans, use_bias=False, kernel_std=math.sqrt(1.0 / self.inp_chans), channels_last=self.channels_last, dtype=self.dtype, name="skip")(xs) + dx
        return dx


class AtmoSphericNeuralOperatorNet(nn.Module):
    """FCN3 backbone (ref fourcastnet3.py:659-1135)."""

    model_grid_type: str = "equiangular"
    sht_grid_type: str = "legendre-gauss"
    inp_shape: Tuple[int, int] = (721, 1440)
    out_shape: Tuple[int, int] = (721, 1440)
    kernel_shape: Sequence[int] = (3, 3)
    filter_basis_type: str = "piecewise linear"
    filter_basis_norm_mode: str = "mean"
    scale_factor: int = 8
    encoder_mlp: bool = False
    upsample_sht: bool = False
    channel_names: Sequence[str] = ("u500", "v500")
    aux_channel_names: Sequence[str] = ()
    atmo_embed_dim: int = 8
    surf_embed_dim: int = 8
    aux_embed_dim: int = 8
    num_layers: int = 4
    num_groups: int = 1
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    activation_function: str = "gelu"
    layer_scale: bool = True
    pos_drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    mlp_drop_rate: float = 0.0
    normalization_layer: str = "none"
    max_modes: Optional[Tuple[int, int]] = None
    hard_thresholding_fraction: float = 1.0
    sfno_block_frequency: int = 2
    big_skip: bool = False
    clamp_water: bool = False
    use_bias: bool = False
    # cutoff heuristic: "nlat" (FCN3, fourcastnet3.py:47-50) or "lmax"
    # (FCN3.1, fourcastnet3_1.py:55-57: kernel_shape[0] * pi / lmax)
    theta_cutoff_mode: str = "nlat"
    # run the processor in channels-last layout: channel-contracting GEMMs
    # (MLPs, spectral convs, DISCO weight mixes) keep channels minormost for
    # the MXU (SFNO's conversion measured 1.6x on these GEMMs, PERF.md);
    # the external (B, C, H, W) interface and parameter shapes are unchanged
    channels_last: bool = True
    checkpointing_level: int = 0
    # optional normalization stats for water clamping offsets
    water_means: Optional[Any] = None
    water_stds: Optional[Any] = None
    # accepted for registry compatibility (wrapper passes them; unused directly)
    inp_chans: int = 0
    out_chans: int = 0
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

        # FCN3.1 lmax-based cutoff override (None keeps the per-module nlat heuristic)
        t_cut = None
        if self.theta_cutoff_mode == "lmax":
            t_cut = self.kernel_shape[0] * math.pi / float(max(modes[0], 1))

        # internal-grid SHT pair for the global blocks
        _, _, sht, isht = build_spectral_transforms(
            "sht", (h, w), (h, w), (h, w), modes, self.sht_grid_type, self.sht_grid_type
        )

        atmo_chans, surf_chans, dyn_aux, stat_aux, plvls = get_channel_groups(
            list(self.channel_names), list(self.aux_channel_names)
        )
        aux_chans = list(dyn_aux) + list(stat_aux)
        n_atmo_groups = len(plvls)
        n_atmo = len(atmo_chans) // max(n_atmo_groups, 1)
        n_surf = len(surf_chans)
        n_aux = len(aux_chans)
        n_out_chans = n_atmo_groups * n_atmo + n_surf
        total_embed = n_atmo_groups * self.atmo_embed_dim + self.surf_embed_dim * (n_surf > 0)

        B = x.shape[0]
        kernel_shape = tuple(self.kernel_shape)

        # FCN3 has no history support (the reference raises too,
        # fourcastnet3.py); FCN3.1's unified encoder handles n_history > 0
        n_expected = len(self.channel_names) + len(self.aux_channel_names)
        if x.shape[1] != n_expected:
            raise ValueError(
                f"FCN3 expects a single-step input of {n_expected} channels, got {x.shape[1]} "
                f"(n_history > 0? use nettype FCN3.1)"
            )

        # trainers may feed lat-padded inputs (Hpad = H + (-H) % mesh_h,
        # SFNO's padded-721 convention); run the net on logical rows and pad
        # the output back (the distributed DISCO re-pads internally)
        pad_h = x.shape[-2] - self.inp_shape[0]
        if pad_h > 0:
            x = x[..., : self.inp_shape[0], :]

        if self.big_skip:
            residual = x[:, :n_out_chans]

        # ---- encode (shared atmo encoder batched over pressure-level groups);
        # checkpointing level >= 1 remats the full-res encoders/decoders
        # (ref fourcastnet3_1.py:1113-1125 applies the same levels)
        enc_cls = nn.remat(DiscreteContinuousEncoder) if self.checkpointing_level >= 1 else DiscreteContinuousEncoder
        dec_cls = nn.remat(DiscreteContinuousDecoder) if self.checkpointing_level >= 1 else DiscreteContinuousDecoder
        x_atmo = x[:, np.asarray(atmo_chans)] if atmo_chans else None
        enc_parts = []
        if x_atmo is not None:
            xa = x_atmo.reshape(B * n_atmo_groups, n_atmo, *self.inp_shape)
            xa = enc_cls(
                self.inp_shape,
                (h, w),
                n_atmo,
                self.atmo_embed_dim,
                grid_in=self.model_grid_type,
                grid_out=self.sht_grid_type,
                kernel_shape=kernel_shape,
                basis_type=self.filter_basis_type,
                basis_norm_mode=self.filter_basis_norm_mode,
                use_mlp=self.encoder_mlp,
                act_layer=act,
                groups=math.gcd(n_atmo, self.atmo_embed_dim),
                use_bias=self.use_bias,
                theta_cutoff=t_cut,
                dtype=self.dtype,
                name="atmo_encoder",
            )(xa)
            enc_parts.append(xa.reshape(B, n_atmo_groups * self.atmo_embed_dim, h, w))
        if n_surf > 0:
            xs = enc_cls(
                self.inp_shape,
                (h, w),
                n_surf,
                self.surf_embed_dim,
                grid_in=self.model_grid_type,
                grid_out=self.sht_grid_type,
                kernel_shape=kernel_shape,
                basis_type=self.filter_basis_type,
                basis_norm_mode=self.filter_basis_norm_mode,
                use_mlp=self.encoder_mlp,
                act_layer=act,
                groups=math.gcd(n_surf, self.surf_embed_dim),
                use_bias=self.use_bias,
                theta_cutoff=t_cut,
                dtype=self.dtype,
                name="surf_encoder",
            )(x[:, np.asarray(surf_chans)])
            enc_parts.append(xs)
        z = jnp.concatenate(enc_parts, axis=1)

        z_aux = None
        if n_aux > 0:
            z_aux = enc_cls(
                self.inp_shape,
                (h, w),
                n_aux,
                self.aux_embed_dim,
                grid_in=self.model_grid_type,
                grid_out=self.sht_grid_type,
                kernel_shape=kernel_shape,
                basis_type=self.filter_basis_type,
                basis_norm_mode=self.filter_basis_norm_mode,
                use_mlp=self.encoder_mlp,
                act_layer=act,
                groups=math.gcd(n_aux, self.aux_embed_dim),
                use_bias=self.use_bias,
                theta_cutoff=t_cut,
                dtype=self.dtype,
                name="aux_encoder",
            )(x[:, np.asarray(aux_chans)])

        if self.pos_drop_rate > 0:
            z = nn.Dropout(self.pos_drop_rate)(z, deterministic=deterministic)

        # ---- processor (channels-last inside: one transpose in, one out)
        cl = self.channels_last
        if cl:
            z = jnp.transpose(z, (0, 2, 3, 1))
            if z_aux is not None:
                z_aux = jnp.transpose(z_aux, (0, 2, 3, 1))
        dpr = np.linspace(0, self.path_drop_rate, self.num_layers)
        block_cls = nn.remat(FCN3Block, static_argnums=(2,)) if self.checkpointing_level >= 3 else FCN3Block
        for i in range(self.num_layers):
            conv_type = "global" if i % self.sfno_block_frequency == 0 else "local"
            if z_aux is not None:
                z = jnp.concatenate([z, z_aux], axis=-1 if cl else 1)
            z = block_cls(
                sht,
                isht,
                total_embed + (self.aux_embed_dim if z_aux is not None else 0),
                total_embed,
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
                kernel_shape=kernel_shape,
                basis_type=self.filter_basis_type,
                basis_norm_mode=self.filter_basis_norm_mode,
                use_bias=self.use_bias,
                theta_cutoff=t_cut,
                channels_last=cl,
                dtype=self.dtype,
                name=f"block{i}",
            )(z, deterministic)
        if cl:
            z = jnp.transpose(z, (0, 3, 1, 2))

        # ---- decode
        out = jnp.zeros((B, n_out_chans, *self.out_shape), x.dtype)
        za = z[:, : n_atmo_groups * self.atmo_embed_dim].reshape(B * n_atmo_groups, self.atmo_embed_dim, h, w)
        ya = dec_cls(
            (h, w),
            self.out_shape,
            self.atmo_embed_dim,
            n_atmo,
            grid_in=self.sht_grid_type,
            grid_out=self.model_grid_type,
            kernel_shape=kernel_shape,
            basis_type=self.filter_basis_type,
            basis_norm_mode=self.filter_basis_norm_mode,
            use_mlp=self.encoder_mlp,
            act_layer=act,
            groups=math.gcd(n_atmo, self.atmo_embed_dim),
            use_bias=self.use_bias,
            upsample_sht=self.upsample_sht,
            theta_cutoff=t_cut,
            dtype=self.dtype,
            name="atmo_decoder",
        )(za)
        out = out.at[:, np.asarray(atmo_chans)].set(ya.reshape(B, n_atmo_groups * n_atmo, *self.out_shape))
        if n_surf > 0:
            ys = dec_cls(
                (h, w),
                self.out_shape,
                self.surf_embed_dim,
                n_surf,
                grid_in=self.sht_grid_type,
                grid_out=self.model_grid_type,
                kernel_shape=kernel_shape,
                basis_type=self.filter_basis_type,
                basis_norm_mode=self.filter_basis_norm_mode,
                use_mlp=self.encoder_mlp,
                act_layer=act,
                groups=math.gcd(n_surf, self.surf_embed_dim),
                use_bias=self.use_bias,
                upsample_sht=self.upsample_sht,
                theta_cutoff=t_cut,
                dtype=self.dtype,
                name="surf_decoder",
            )(z[:, -self.surf_embed_dim :])
            out = out.at[:, np.asarray(surf_chans)].set(ys)

        if self.big_skip:
            out = out + Conv1x1(
                n_out_chans,
                use_bias=False,
                kernel_std=math.sqrt(0.5 / n_out_chans),
                dtype=self.dtype,
                name="residual_transform",
            )(residual)

        # ---- water channel clamping (ref fourcastnet3.py:1078-1098)
        if self.clamp_water:
            water = get_water_channels(list(self.channel_names))
            if water:
                widx = np.asarray(water)
                if self.water_means is not None and self.water_stds is not None:
                    offset = (np.asarray(self.water_means)[widx] / np.asarray(self.water_stds)[widx]).astype(np.float32)
                    offset = jnp.asarray(offset)[None, :, None, None]
                else:
                    offset = 0.0
                clamped = _soft_clamp(out[:, widx], offset=offset) - offset
                out = out.at[:, widx].set(clamped.astype(out.dtype))

        if pad_h > 0:
            out = jnp.pad(out, [(0, 0), (0, 0), (0, pad_h), (0, 0)])
        return out
