"""Spherical Fourier Neural Operator (SFNO/FNO) — flax.linen, TPU-native.

Re-implementation of the reference architecture
(``makani/models/networks/sfnonet.py:52-1046``): encoder -> N neural-operator
blocks (spectral filter + skips + instance norm + MLP) -> decoder with a
big-skip connection. The first block downsamples from the input grid to an
internal grid coarsened by ``scale_factor``; the last block maps back.

Differences from the reference are deliberate TPU choices:
  * transforms are plain callables chosen once at model build
    (serial `ops.sht` / `ops.fft`, or `parallel.transforms` when the mesh's
    spatial axes are >1); there is no separate "distributed model" — sharding
    is carried by the mesh and pjit.
  * uneven 721-latitude sharding is handled by zero-padded latitudes; the
    network pads on entry and crops on exit, and uses padding-aware norms.
  * rollout/checkpointing policy lives in the stepper (jax.checkpoint), not
    in the block.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.common.layers import MLP, Conv1x1, DropPath, EncoderDecoder
from makani_tpu.models.common.layer_norm import ChannelLayerNorm, GeometricInstanceNormS2, InstanceNorm2d
from makani_tpu.models.common.spectral_convolution import SpectralAttention, SpectralConv
from makani_tpu.ops.fft import InverseRealFFT2, RealFFT2
from makani_tpu.ops.sht import InverseRealSHT, RealSHT
from makani_tpu.parallel import mesh as pmesh

__all__ = ["SphericalFourierNeuralOperatorNet", "FourierNeuralOperatorNet", "build_spectral_transforms"]


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": partial(jax.nn.gelu, approximate=False),
    "silu": jax.nn.silu,
    "sin": jnp.sin,
    "identity": lambda x: x,
}


# bounded LRU: linen re-binds setup on every call so the tables must be
# reused, but long multi-config processes (test suites) would otherwise
# accumulate hundreds of MB of fp32 tables across configs/meshes
_TRANSFORM_CACHE: "dict" = {}
_TRANSFORM_CACHE_MAX = 8


def build_spectral_transforms(
    spectral_transform: str,
    inp_shape: Tuple[int, int],
    out_shape: Tuple[int, int],
    internal_shape: Tuple[int, int],
    modes: Tuple[int, int],
    model_grid_type: str = "equiangular",
    sht_grid_type: str = "legendre-gauss",
):
    """Build (trans_down, itrans_up, trans, itrans) — the four transform
    handles the SFNO wires into its blocks (ref sfnonet.py:765-838). Picks the
    distributed implementations when the mesh's spatial axes are > 1.

    Memoized: linen calls ``setup`` on every bind, and the Legendre tables for
    the 721x1440 grid are hundreds of MB, so they must be built exactly once
    per (config, mesh)."""
    key = (
        spectral_transform,
        tuple(inp_shape),
        tuple(out_shape),
        tuple(internal_shape),
        tuple(modes),
        model_grid_type,
        sht_grid_type,
        pmesh.get_mesh() if pmesh.is_distributed("spatial") else None,
    )
    if key in _TRANSFORM_CACHE:
        # move-to-end for LRU semantics
        out = _TRANSFORM_CACHE.pop(key)
        _TRANSFORM_CACHE[key] = out
        return out
    out = _build_spectral_transforms(
        spectral_transform, inp_shape, out_shape, internal_shape, modes, model_grid_type, sht_grid_type
    )
    _TRANSFORM_CACHE[key] = out
    while len(_TRANSFORM_CACHE) > _TRANSFORM_CACHE_MAX:
        _TRANSFORM_CACHE.pop(next(iter(_TRANSFORM_CACHE)))
    return out


def _build_spectral_transforms(
    spectral_transform,
    inp_shape,
    out_shape,
    internal_shape,
    modes,
    model_grid_type,
    sht_grid_type,
):
    modes_lat, modes_lon = modes
    distributed = pmesh.is_distributed("spatial")

    if spectral_transform == "sht":
        if distributed:
            from makani_tpu.parallel.transforms import DistributedInverseRealSHT, DistributedRealSHT

            sht, isht = DistributedRealSHT, DistributedInverseRealSHT
        else:
            sht, isht = RealSHT, InverseRealSHT
        trans_down = sht(*inp_shape, lmax=modes_lat, mmax=modes_lon, grid=model_grid_type)
        itrans_up = isht(*out_shape, lmax=modes_lat, mmax=modes_lon, grid=model_grid_type)
        trans = sht(*internal_shape, lmax=modes_lat, mmax=modes_lon, grid=sht_grid_type)
        itrans = isht(*internal_shape, lmax=modes_lat, mmax=modes_lon, grid=sht_grid_type)
    elif spectral_transform == "fft":
        if distributed:
            from makani_tpu.parallel.transforms import DistributedInverseRealFFT2, DistributedRealFFT2

            fft, ifft = DistributedRealFFT2, DistributedInverseRealFFT2
        else:
            fft, ifft = RealFFT2, InverseRealFFT2
        trans_down = fft(*inp_shape, lmax=modes_lat, mmax=modes_lon)
        itrans_up = ifft(*out_shape, lmax=modes_lat, mmax=modes_lon)
        trans = fft(*internal_shape, lmax=modes_lat, mmax=modes_lon)
        itrans = ifft(*internal_shape, lmax=modes_lat, mmax=modes_lon)
    else:
        raise ValueError(f"Unknown spectral transform {spectral_transform}")
    return trans_down, itrans_up, trans, itrans


def _pad_lat(x, nlat_pad):
    if x.shape[-2] == nlat_pad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, nlat_pad - x.shape[-2]), (0, 0)])


def _crop_lat(x, nlat):
    if x.shape[-2] == nlat:
        return x
    return x[..., :nlat, :]


class SpectralFilterLayer(nn.Module):
    """Dispatch between the linear conv and the nonlinear spectral MLP
    (ref sfnonet.py:52-166)."""

    forward_transform: Any
    inverse_transform: Any
    embed_dim: int
    filter_type: str = "linear"
    operator_type: str = "diagonal"
    hidden_size_factor: float = 1.0
    separable: bool = False
    complex_activation: str = "real"
    spectral_layers: int = 1
    use_bias: bool = False
    gain: float = 1.0
    channels_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.filter_type == "non-linear":
            return SpectralAttention(
                self.forward_transform,
                self.inverse_transform,
                self.embed_dim,
                self.embed_dim,
                operator_type=self.operator_type,
                hidden_size_factor=int(self.hidden_size_factor),
                complex_activation=self.complex_activation,
                spectral_layers=self.spectral_layers,
                use_bias=self.use_bias,
                gain=self.gain,
                channels_last=self.channels_last,
                dtype=self.dtype,
                name="filter",
            )(x)
        elif self.filter_type == "linear":
            return SpectralConv(
                self.forward_transform,
                self.inverse_transform,
                self.embed_dim,
                self.embed_dim,
                operator_type=self.operator_type,
                separable=self.separable,
                use_bias=self.use_bias,
                gain=self.gain,
                channels_last=self.channels_last,
                dtype=self.dtype,
                name="filter",
            )(x)
        raise NotImplementedError(f"filter_type {self.filter_type}")


class NeuralOperatorBlock(nn.Module):
    """One SFNO processor block (ref sfnonet.py:169-408):

        x -> filter -> norm0 -> [+ inner_skip(residual)] -> act
          -> mlp -> norm1 -> drop_path -> [+ outer_skip(residual)] -> [act]
    """

    forward_transform: Any
    inverse_transform: Any
    embed_dim: int
    filter_type: str = "linear"
    operator_type: str = "diagonal"
    mlp_ratio: float = 2.0
    mlp_drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    act_layer: Callable = jax.nn.gelu
    norm_layers: Tuple[Callable, Callable] = (None, None)
    separable: bool = False
    inner_skip: str = "none"
    outer_skip: str = "linear"
    use_mlp: bool = True
    complex_activation: str = "real"
    spectral_layers: int = 1
    use_bias: bool = False
    final_activation: bool = False
    checkpointing_level: int = 0
    channels_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        is_identity_act = self.act_layer is None
        gain_factor = 1.0 if is_identity_act else 2.0
        if self.inner_skip in ("linear", "identity"):
            gain_factor /= 2.0

        x, residual = SpectralFilterLayer(
            self.forward_transform,
            self.inverse_transform,
            self.embed_dim,
            filter_type=self.filter_type,
            operator_type=self.operator_type,
            hidden_size_factor=self.mlp_ratio,
            separable=self.separable,
            complex_activation=self.complex_activation,
            spectral_layers=self.spectral_layers,
            use_bias=self.use_bias,
            gain=gain_factor,
            channels_last=self.channels_last,
            dtype=self.dtype,
            name="filter_layer",
        )(x)

        if self.norm_layers[0] is not None:
            x = self.norm_layers[0](name="norm0")(x)

        if self.inner_skip == "linear":
            x = x + Conv1x1(
                self.embed_dim,
                use_bias=False,
                kernel_std=math.sqrt(gain_factor / self.embed_dim),
                channels_last=self.channels_last,
                dtype=self.dtype,
                name="inner_skip",
            )(residual)
        elif self.inner_skip == "identity":
            x = x + residual
        elif self.inner_skip != "none":
            raise ValueError(f"Unknown skip connection type {self.inner_skip}")

        if not is_identity_act:
            x = self.act_layer(x)

        gain_factor = 2.0 if (self.final_activation and not is_identity_act) else 1.0
        if self.outer_skip in ("linear", "identity"):
            gain_factor /= 2.0

        if self.use_mlp:
            # checkpointing level >= 2 remats the block MLPs (ref
            # sfnonet.py:899-926 checkpointing granularities)
            mlp_cls = nn.remat(MLP, static_argnums=(2,)) if self.checkpointing_level >= 2 else MLP
            x = mlp_cls(
                hidden_features=int(self.embed_dim * self.mlp_ratio),
                out_features=self.embed_dim,
                act_layer=self.act_layer if not is_identity_act else (lambda v: v),
                drop_rate=self.mlp_drop_rate,
                drop_type="features",
                gain=gain_factor,
                channels_last=self.channels_last,
                dtype=self.dtype,
                name="mlp",
            )(x, deterministic)

        if self.norm_layers[1] is not None:
            x = self.norm_layers[1](name="norm1")(x)

        if self.path_drop_rate > 0.0:
            x = DropPath(self.path_drop_rate, name="drop_path")(x, deterministic=deterministic)

        if self.outer_skip == "linear":
            x = x + Conv1x1(
                self.embed_dim,
                use_bias=False,
                kernel_std=math.sqrt(gain_factor / self.embed_dim),
                channels_last=self.channels_last,
                dtype=self.dtype,
                name="outer_skip",
            )(residual)
        elif self.outer_skip == "identity":
            x = x + residual
        elif self.outer_skip != "none":
            raise ValueError(f"Unknown skip connection type {self.outer_skip}")

        if self.final_activation and not is_identity_act:
            x = self.act_layer(x)

        return x


class SphericalFourierNeuralOperatorNet(nn.Module):
    """SFNO (ref sfnonet.py:411-934). Config attribute names mirror the
    reference YAML surface so recipes carry over unchanged."""

    spectral_transform: str = "sht"
    model_grid_type: str = "equiangular"
    sht_grid_type: str = "legendre-gauss"
    filter_type: str = "linear"
    operator_type: str = "dhconv"
    inp_shape: Tuple[int, int] = (721, 1440)
    out_shape: Tuple[int, int] = (721, 1440)
    scale_factor: int = 8
    inp_chans: int = 2
    out_chans: int = 2
    embed_dim: int = 32
    num_layers: int = 4
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    encoder_ratio: int = 1
    decoder_ratio: int = 1
    activation_function: str = "gelu"
    encoder_layers: int = 1
    pos_embed: str = "none"
    pos_drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    mlp_drop_rate: float = 0.0
    normalization_layer: str = "instance_norm"
    max_modes: Optional[Tuple[int, int]] = None
    hard_thresholding_fraction: float = 1.0
    big_skip: bool = True
    separable: bool = False
    complex_activation: str = "real"
    spectral_layers: int = 3
    use_bias: bool = False
    checkpointing_level: int = 0
    # selective rematerialization: "dots" wraps every processor block in
    # jax.checkpoint with the dots_saveable policy — GEMM/conv outputs are
    # stored for the backward pass, while elementwise chains (norms,
    # activations, skips) are recomputed from them, trading VPU recompute
    # for the HBM write+read of each stored intermediate (the step is
    # bandwidth-bound, PERF.md roofline). "save_transforms" remats blocks
    # but pins the tagged SHT/FFT outputs; "save_transforms_stats" also pins
    # the instance-norm statistics (tiny, but their recompute re-reads the
    # full activation twice per norm). "full" = remat whole blocks
    # saving nothing (equivalent to checkpointing_level 3). Orthogonal to
    # checkpointing_level; ignored when level >= 3 already remats blocks.
    remat_policy: str = "none"
    # internal activation layout: channels-last (B, H, W, C) keeps every
    # pointwise GEMM's contracting dim minormost — measured 1.6x faster on the
    # full-res encoder/decoder GEMMs (PERF.md). External API stays NCHW.
    # Auto-disabled when spatially distributed (the distributed transforms
    # operate on NCHW shards).
    channels_last: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.h = self.inp_shape[0] // self.scale_factor
        self.w = self.inp_shape[1] // self.scale_factor

        if self.max_modes is not None:
            modes = tuple(self.max_modes)
        else:
            modes = (
                int(self.h * self.hard_thresholding_fraction),
                int((self.w // 2 + 1) * self.hard_thresholding_fraction),
            )

        self.trans_down, self.itrans_up, self.trans, self.itrans = build_spectral_transforms(
            self.spectral_transform,
            self.inp_shape,
            self.out_shape,
            (self.h, self.w),
            modes,
            self.model_grid_type,
            self.sht_grid_type,
        )

        # padded latitude sizes (no-ops in the serial case)
        self.inp_nlat_pad = getattr(self.trans_down, "nlat_pad", self.inp_shape[0])
        self.out_nlat_pad = getattr(self.itrans_up, "nlat_pad", self.out_shape[0])
        self.int_nlat_pad = getattr(self.trans, "nlat_pad", self.h)

        # channels-last everywhere: the distributed transforms carry
        # channels-last shard_map variants (parallel/transforms.py
        # analysis_cl/synthesis_cl), so the 1.6x GEMM layout win reaches
        # spatially-distributed configurations too (round-2 VERDICT item 3)
        self._cl = self.channels_last

    def _act(self):
        return _ACTIVATIONS[self.activation_function]

    def _norm_layer(self, img_shape, nlat_phys, grid_type):
        if self.normalization_layer == "instance_norm":
            return partial(
                InstanceNorm2d,
                num_features=self.embed_dim,
                eps=1e-6,
                affine=True,
                nlat_phys=nlat_phys,
                channels_last=self._cl,
                dtype=self.dtype,
            )
        if self.normalization_layer == "instance_norm_s2":
            return partial(
                GeometricInstanceNormS2,
                img_shape=img_shape,
                grid_type=grid_type,
                num_features=self.embed_dim,
                eps=1e-6,
                affine=True,
                channels_last=self._cl,
                dtype=self.dtype,
            )
        if self.normalization_layer == "layer_norm":
            return partial(ChannelLayerNorm, num_features=self.embed_dim, eps=1e-6, affine=True, channels_last=self._cl, dtype=self.dtype)
        if self.normalization_layer == "none":
            return None
        raise NotImplementedError(f"normalization {self.normalization_layer} not implemented")

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        act = self._act()

        norm_inp = self._norm_layer((self.h, self.w), self.h, self.model_grid_type)
        norm_mid = norm_inp
        norm_out = self._norm_layer(self.out_shape, self.out_shape[0], self.model_grid_type)

        # model I/O convention: when spatially distributed, fields are padded in
        # latitude to the mesh multiple end-to-end (pad rows are ignored by the
        # transforms and by quadrature-weighted losses); serial callers may pass
        # the physical latitude count and get it back.
        # Cast to the compute dtype up front (the reference's AMP autocast):
        # without it, mixed fp32-activation x bf16-weight einsums silently
        # promote every pointwise GEMM to fp32.
        x = x.astype(self.dtype)
        x = _pad_lat(x, self.inp_nlat_pad)
        if self._cl:
            x = jnp.transpose(x, (0, 2, 3, 1))

        # big skip at the output resolution
        if self.big_skip:
            if self.out_shape != self.inp_shape:
                from makani_tpu.ops.precision import transform_io_dtype

                if self._cl:
                    residual = self.itrans_up.synthesis_cl(self.trans_down.analysis_cl(x.astype(transform_io_dtype()))).astype(x.dtype)
                else:
                    residual = self.itrans_up.synthesis(self.trans_down.analysis(x.astype(transform_io_dtype()))).astype(x.dtype)
            else:
                residual = x

        # checkpointing granularities follow the reference (sfnonet.py:857-926):
        # level >= 1 remats the encoder/decoder, >= 2 the block MLPs,
        # >= 3 whole blocks
        encdec_cls = nn.remat(EncoderDecoder) if self.checkpointing_level >= 1 else EncoderDecoder

        x = encdec_cls(
            num_layers=self.encoder_layers,
            output_dim=self.embed_dim,
            hidden_dim=int(self.encoder_ratio * self.embed_dim),
            act_layer=act,
            channels_last=self._cl,
            dtype=self.dtype,
            name="encoder",
        )(x)

        if self.pos_embed == "direct":
            # stored in the active layout (channels-last checkpoints differ in
            # this one param's shape; convert_checkpoint handles the transpose)
            pe_shape = (
                (1, self.inp_nlat_pad, self.inp_shape[1], self.embed_dim)
                if self._cl
                else (1, self.embed_dim, self.inp_nlat_pad, self.inp_shape[1])
            )
            pe = self.param("pos_embed", nn.initializers.truncated_normal(stddev=0.02), pe_shape, jnp.float32)
            x = x + pe.astype(x.dtype)
        elif self.pos_embed == "frequency":
            lmax = getattr(self.itrans_up, "lmax_pad", self.itrans_up.lmax)
            mmax = getattr(self.itrans_up, "mmax_pad", self.itrans_up.mmax)
            rc = self.param("pos_embed_real", nn.initializers.truncated_normal(stddev=0.02), (1, self.embed_dim, lmax, mmax), jnp.float32)
            cc = self.param("pos_embed_imag", nn.initializers.truncated_normal(stddev=0.02), (1, self.embed_dim, lmax, mmax - 1), jnp.float32)
            ls = jnp.arange(lmax)[:, None]
            ms = jnp.arange(mmax)[None, :]
            tril = (ms <= ls).astype(jnp.float32)
            coeff2 = jnp.stack(
                [rc * tril, jnp.pad(cc, ((0, 0), (0, 0), (0, 0), (1, 0))) * (jnp.where(ms >= 1, 1.0, 0.0) * tril)],
                axis=-1,
            )
            if self._cl:
                pe = self.itrans_up.synthesis_cl(jnp.transpose(coeff2, (0, 2, 3, 1, 4)))
                pe = pe[..., : x.shape[-3], :, :] if pe.shape[-3] != x.shape[-3] else pe
            else:
                pe = self.itrans_up.synthesis(coeff2)
                pe = _crop_lat(pe, x.shape[-2])
            x = x + pe.astype(x.dtype)
        elif self.pos_embed not in ("none", "None", None):
            raise ValueError("Unknown position embedding type")

        if self.pos_drop_rate > 0.0:
            x = nn.Dropout(rate=self.pos_drop_rate)(x, deterministic=deterministic)

        import numpy as _np

        dpr = [float(v) for v in _np.linspace(0, self.path_drop_rate, self.num_layers)]
        # checkpointing level >= 3 remats each block (ref sfnonet.py:857-864)
        if self.checkpointing_level >= 3:
            block_cls = nn.remat(NeuralOperatorBlock, static_argnums=(2,))
        elif self.remat_policy == "dots":
            block_cls = nn.remat(
                NeuralOperatorBlock, static_argnums=(2,), policy=jax.checkpoint_policies.dots_saveable
            )
        elif self.remat_policy == "save_transforms":
            # per-block remat that KEEPS the tagged SHT/FFT outputs: the bwd
            # pass recomputes only elementwise chains and MLP GEMMs, not the
            # full-res spectral transforms (the dominant recompute at 0.25 deg)
            block_cls = nn.remat(
                NeuralOperatorBlock,
                static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names("spectral_transform"),
            )
        elif self.remat_policy == "save_transforms_stats":
            # save_transforms plus the tagged instance-norm statistics: the
            # stats are O(B*C) scalars but recomputing each norm's two-pass
            # mean/var costs two full spatial-reduction reads of the
            # activation — at full res the costliest remaining elementwise
            # recompute after the transforms are pinned (layer_norm._tag_stats)
            block_cls = nn.remat(
                NeuralOperatorBlock,
                static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names("spectral_transform", "norm_stats"),
            )
        elif self.remat_policy == "full":
            block_cls = nn.remat(NeuralOperatorBlock, static_argnums=(2,))
        else:
            block_cls = NeuralOperatorBlock
        for i in range(self.num_layers):
            first, last = i == 0, i == self.num_layers - 1
            fwd_t = self.trans_down if first else self.trans
            inv_t = self.itrans_up if last else self.itrans
            norms = (
                (norm_inp, norm_mid) if first else ((norm_out, norm_out) if last else (norm_mid, norm_mid))
            )
            block = block_cls(
                fwd_t,
                inv_t,
                self.embed_dim,
                filter_type=self.filter_type,
                operator_type=self.operator_type,
                mlp_ratio=self.mlp_ratio,
                mlp_drop_rate=self.mlp_drop_rate,
                path_drop_rate=dpr[i],
                act_layer=act,
                norm_layers=norms,
                separable=self.separable,
                inner_skip="none",
                outer_skip="linear",
                use_mlp=self.use_mlp,
                complex_activation=self.complex_activation,
                spectral_layers=self.spectral_layers,
                use_bias=self.use_bias,
                checkpointing_level=0 if self.checkpointing_level >= 3 else self.checkpointing_level,
                channels_last=self._cl,
                dtype=self.dtype,
                name=f"block{i}",
            )
            x = block(x, deterministic)

        x = encdec_cls(
            num_layers=self.encoder_layers,
            output_dim=self.out_chans,
            hidden_dim=int(self.decoder_ratio * self.embed_dim),
            act_layer=act,
            gain=0.5 if self.big_skip else 1.0,
            channels_last=self._cl,
            dtype=self.dtype,
            name="decoder",
        )(x)

        if self.big_skip:
            x = x + Conv1x1(
                self.out_chans,
                use_bias=False,
                kernel_std=math.sqrt(0.5 / self.inp_chans),
                channels_last=self._cl,
                dtype=self.dtype,
                name="residual_transform",
            )(residual)

        if self._cl:
            x = jnp.transpose(x, (0, 3, 1, 2))
        return x


class FourierNeuralOperatorNet(SphericalFourierNeuralOperatorNet):
    """Planar FNO: SFNO with FFT transforms (ref sfnonet.py:980-1046)."""

    spectral_transform: str = "fft"
