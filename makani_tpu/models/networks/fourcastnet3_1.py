"""FourCastNet 3.1 (ref makani/models/networks/fourcastnet3_1.py:55-1177).

A *restructured* FCN3 — not a parameter tweak. Differences from FCN3 that
this module reproduces (ref net class ``AtmoSphericNeuralOperatorNet31``):

  * **single unified encoder/decoder** over all prognostic channels
    (``embed_dim`` wide, ``groups = gcd(n_in, embed_dim)``) instead of FCN3's
    per-pressure-level channel-grouped encoders (ref :750-801),
  * **learnable latitude position embedding** (``pos_embed_dim`` channels,
    one vector per latitude ring broadcast along longitude — ref
    ``LearnablePositionEmbedding`` with ``embed_type="lat"``,
    models/common/pos_embedding.py:67-140), concatenated to the auxiliary
    embedding before every block,
  * **n_history support**: per-step prognostic/dynamic-aux channel index
    bookkeeping (ref ``_precompute_channel_groups``, :902-963),
  * **lmax-derived kernel cutoff**: ``theta_cutoff = margin * kernel_shape[0]
    * pi / lmax`` (ref :55-57) with lmax defaulting to the spherical
    bandlimit of the input grid times ``hard_thresholding_fraction``
    (ref ``compute_spherical_bandlimit``, utils/grids.py:43-55),
  * **filter basis families** incl. ``fourier-bessel`` (margin 1.5) and the
    ``nodal`` basis normalization (ops/disco.py),
  * **learned SST imputation** conditioned on all input channels, masked by
    the ``xlsml`` land-sea mask when present (ref :741-748, 965-979),
  * plain **big-skip** (no 1x1 transform, ref :1106-1128), soft water-channel
    clamping with normalization offsets (ref :1062-1080).

Deviation (documented): the reference decoder emits channels in
``[surface..., atmo...]`` order (its ``pred_channels`` permutation); here the
decoded channels are scattered back to the dataset channel order so the
network's external contract matches the rest of the framework (losses,
metrics and water-channel indices all address dataset order). Checkpoint
import is unaffected: OUR decoder also produces rows in the same
``surf + atmo`` order before the scatter (``_channel_bookkeeping``), so
imported decoder weights align row-for-row with the reference's — only the
placement of the finished channels differs (tested in
tests/test_fcn31.py::test_fcn31_decoder_row_order_matches_reference).

Input layout (the framework's preprocessor convention): history steps are
flattened oldest-first, each step carrying ``[prognostic..., dynamic aux
(zenith/noise)...]``, with static aux channels appended once at the end. The
big-skip residual uses the *most recent* history copy.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.common.imputation import MLPImputation
from makani_tpu.models.networks.fourcastnet3 import (
    DiscreteContinuousDecoder,
    DiscreteContinuousEncoder,
    FCN3Block,
    _soft_clamp,
)
from makani_tpu.models.networks.sfnonet import _ACTIVATIONS, build_spectral_transforms
from makani_tpu.ops.disco import compute_cutoff_radius_lmax
from makani_tpu.utils.features import get_channel_groups, get_water_channels

__all__ = ["AtmoSphericNeuralOperatorNet31", "compute_spherical_bandlimit"]


def compute_spherical_bandlimit(img_shape, grid_type: str) -> int:
    """Bandlimit of a grid (ref makani/utils/grids.py:43-55)."""
    if grid_type == "equiangular":
        return min((img_shape[0] - 1) // 2, img_shape[1] // 2)
    if grid_type == "legendre-gauss":
        return min(img_shape[0] - 1, img_shape[1] // 2)
    raise NotImplementedError(f"Unknown grid type {grid_type}")


class AtmoSphericNeuralOperatorNet31(nn.Module):
    """FCN3.1 backbone (ref fourcastnet3_1.py:641-1133). Config attribute
    names mirror the reference YAML surface (``embed_dim``, ``pos_embed_dim``,
    ``encoder_bias``, ``lmax``, ...)."""

    model_grid_type: str = "equiangular"
    sht_grid_type: str = "legendre-gauss"
    inp_shape: Tuple[int, int] = (721, 1440)
    out_shape: Tuple[int, int] = (721, 1440)
    kernel_shape: Sequence[int] = (3, 3)
    filter_basis_type: str = "harmonic"
    filter_basis_norm_mode: str = "mean"
    resample_sht: bool = False
    channel_names: Sequence[str] = ("u500", "v500")
    aux_channel_names: Sequence[str] = ()
    n_history: int = 0
    embed_dim: int = 8
    aux_embed_dim: int = 8
    pos_embed_dim: int = 0
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
    hard_thresholding_fraction: float = 0.25
    scale_factor: int = 8
    lmax: Optional[int] = None
    sfno_block_frequency: int = 2
    big_skip: bool = False
    clamp_water: bool = False
    encoder_bias: bool = False
    use_bias: bool = False
    # channels-last processor (see fourcastnet3.py: same FCN3Block flag;
    # external interface and parameter shapes unchanged)
    channels_last: bool = True
    checkpointing_level: int = 0
    # accepted for reference-config compatibility; our DISCO path is always
    # the precomputed-table ("fused") formulation
    fused: bool = True
    # optional normalization stats for water clamping offsets
    water_means: Optional[Any] = None
    water_stds: Optional[Any] = None
    # registry compatibility (wrapper passes them; channel lists drive shapes)
    inp_chans: int = 0
    out_chans: int = 0
    dtype: Any = jnp.float32

    def _channel_bookkeeping(self):
        """Per-history-step channel index maps (ref fourcastnet3_1.py:902-963,
        re-derived for this framework's input layout: ``[prognostic...,
        per-step dynamic aux (xzen/xnoise)...] x T`` then static aux once)."""
        atmo, surf, _, _, _plvls = get_channel_groups(list(self.channel_names), [])
        aux_names = list(self.aux_channel_names)
        # the preprocessor appends zenith/noise per history step and every
        # other auxiliary (grid, orography, landmask, soiltype) once at the end
        dyn_aux_names = [n for n in aux_names if n.startswith(("xzen", "xnoise"))]
        stat_aux_names = [n for n in aux_names if not n.startswith(("xzen", "xnoise"))]

        T = self.n_history + 1
        n_prog = len(self.channel_names)
        n_dyn_aux = len(dyn_aux_names)
        n_dyn = n_prog + n_dyn_aux  # channels per history step

        # unified encoder input: surf then atmo, each over all history steps
        # (mirrors ref in_channels = surf_chans_in + atmo_chans_in)
        surf_in = [t * n_dyn + c for t in range(T) for c in surf]
        atmo_in = [t * n_dyn + c for t in range(T) for c in atmo]
        in_idx = surf_in + atmo_in

        # aux encoder input: dynamic aux over all steps + static aux at the end
        aux_idx = [t * n_dyn + n_prog + j for t in range(T) for j in range(n_dyn_aux)]
        aux_idx += [T * n_dyn + j for j in range(len(stat_aux_names))]

        # output channels in decoder order (surf then atmo), plus their
        # dataset positions for the scatter-back
        pred_idx = list(surf) + list(atmo)
        # most recent history copy for the big-skip residual
        resid_idx = [(T - 1) * n_dyn + c for c in pred_idx]

        # sst + land-mask bookkeeping (all history copies of sst are imputed)
        sst = [i for i, n in enumerate(self.channel_names) if n == "sst"]
        sst_in = [t * n_dyn + c for t in range(T) for c in sst]
        lsm_in = []
        if "xlsml" in stat_aux_names:
            lsm_in = [T * n_dyn + stat_aux_names.index("xlsml")]
        return in_idx, aux_idx, pred_idx, resid_idx, sst_in, lsm_in, n_prog

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = _ACTIVATIONS[self.activation_function]
        h = int(self.inp_shape[0] // self.scale_factor)
        w = int(self.inp_shape[1] // self.scale_factor)

        # spectral truncation and the lmax-derived kernel cutoff
        lmax = self.lmax
        if lmax is None:
            lmax = int(compute_spherical_bandlimit(self.inp_shape, self.model_grid_type) * self.hard_thresholding_fraction)
        lmax = min(lmax, compute_spherical_bandlimit((h, w), self.sht_grid_type) + 1)
        t_cut = compute_cutoff_radius_lmax(lmax, tuple(self.kernel_shape), self.filter_basis_type)

        # internal-grid SHT pair for the global blocks (lmax == mmax, ref :899)
        _, _, sht, isht = build_spectral_transforms(
            "sht", (h, w), (h, w), (h, w), (lmax, lmax), self.sht_grid_type, self.sht_grid_type
        )

        in_idx, aux_idx, pred_idx, resid_idx, sst_in, lsm_in, n_prog = self._channel_bookkeeping()
        n_in = len(in_idx)
        n_out = len(pred_idx)
        n_aux = len(aux_idx)
        total_aux = (self.aux_embed_dim if n_aux > 0 else 0) + self.pos_embed_dim
        kernel_shape = tuple(self.kernel_shape)
        B = x.shape[0]

        # lat-padded inputs: run on logical rows, pad the output back
        pad_h = x.shape[-2] - self.inp_shape[0]
        if pad_h > 0:
            x = x[..., : self.inp_shape[0], :]

        # ---- learned SST imputation (NaN/land positions filled by an MLP
        # conditioned on all input channels; ref :741-748, 965-979)
        if sst_in:
            mask = None
            if lsm_in:
                # land-sea mask: 1 over land -> impute there (any history copy)
                lsm = x[:, np.asarray(lsm_in)]
                mask = (lsm[:, :1] > 0.5) if lsm.shape[1] >= 1 else None
                if mask is not None and len(sst_in) > 1:
                    mask = jnp.broadcast_to(mask, (B, len(sst_in), *x.shape[-2:]))
            x = MLPImputation(
                inp_chans=x.shape[1],
                impute_chans=tuple(sst_in),
                mlp_ratio=self.mlp_ratio,
                act_layer=act,
                dtype=self.dtype,
                name="sst_imputation",
            )(x, mask=mask)

        if self.big_skip:
            residual = x[:, np.asarray(resid_idx)]

        # ---- auxiliary embedding (aux encoder + lat position embedding)
        aux_parts = []
        if n_aux > 0:
            za = DiscreteContinuousEncoder(
                self.inp_shape,
                (h, w),
                n_aux,
                self.aux_embed_dim,
                grid_in=self.model_grid_type,
                grid_out=self.sht_grid_type,
                kernel_shape=kernel_shape,
                basis_type=self.filter_basis_type,
                basis_norm_mode=self.filter_basis_norm_mode,
                groups=math.gcd(n_aux, self.aux_embed_dim),
                use_bias=self.encoder_bias,
                theta_cutoff=t_cut,
                dtype=self.dtype,
                name="aux_encoder",
            )(x[:, np.asarray(aux_idx)])
            aux_parts.append(za)
        if self.pos_embed_dim > 0:
            # one learned vector per latitude ring, broadcast along longitude
            # (ref LearnablePositionEmbedding embed_type="lat")
            pe = self.param("pos_embed", nn.initializers.zeros, (1, self.pos_embed_dim, h, 1), jnp.float32)
            aux_parts.append(jnp.broadcast_to(pe.astype(self.dtype), (B, self.pos_embed_dim, h, w)))
        z_aux = jnp.concatenate(aux_parts, axis=1) if aux_parts else None

        # ---- unified encoder over all prognostic channels (ref :750-765);
        # checkpointing level >= 1 remats the encoder/decoder (ref :1113-1125)
        enc_cls = nn.remat(DiscreteContinuousEncoder) if self.checkpointing_level >= 1 else DiscreteContinuousEncoder
        z = enc_cls(
            self.inp_shape,
            (h, w),
            n_in,
            self.embed_dim,
            grid_in=self.model_grid_type,
            grid_out=self.sht_grid_type,
            kernel_shape=kernel_shape,
            basis_type=self.filter_basis_type,
            basis_norm_mode=self.filter_basis_norm_mode,
            groups=math.gcd(n_in, self.embed_dim),
            use_bias=self.encoder_bias,
            theta_cutoff=t_cut,
            dtype=self.dtype,
            name="encoder",
        )(x[:, np.asarray(in_idx)])

        if self.pos_drop_rate > 0:
            z = nn.Dropout(self.pos_drop_rate)(z, deterministic=deterministic)

        # ---- processor: aux (+pos embed) re-concatenated before every block;
        # channels-last inside (one transpose in, one out)
        cl = self.channels_last
        if cl:
            z = jnp.transpose(z, (0, 2, 3, 1))
            if z_aux is not None:
                z_aux = jnp.transpose(z_aux, (0, 2, 3, 1))
        dpr = np.linspace(0, self.path_drop_rate, self.num_layers)
        block_cls = nn.remat(FCN3Block, static_argnums=(2,)) if self.checkpointing_level >= 3 else FCN3Block
        for i in range(self.num_layers):
            conv_type = "global" if (self.sfno_block_frequency > 0 and i % self.sfno_block_frequency == 0) else "local"
            if z_aux is not None:
                z = jnp.concatenate([z, z_aux], axis=-1 if cl else 1)
            z = block_cls(
                sht,
                isht,
                self.embed_dim + (total_aux if z_aux is not None else 0),
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

        # ---- unified decoder (ref :785-801), scattered to dataset order
        dec_cls = nn.remat(DiscreteContinuousDecoder) if self.checkpointing_level >= 1 else DiscreteContinuousDecoder
        y = dec_cls(
            (h, w),
            self.out_shape,
            self.embed_dim,
            n_out,
            grid_in=self.sht_grid_type,
            grid_out=self.model_grid_type,
            kernel_shape=kernel_shape,
            basis_type=self.filter_basis_type,
            basis_norm_mode=self.filter_basis_norm_mode,
            groups=math.gcd(n_out, self.embed_dim),
            use_bias=self.encoder_bias,
            upsample_sht=self.resample_sht,
            theta_cutoff=t_cut,
            dtype=self.dtype,
            name="decoder",
        )(z[:, : self.embed_dim])

        if self.big_skip:
            # plain residual add (no 1x1 transform; ref :1106-1128)
            y = y + residual.astype(y.dtype)

        out = jnp.zeros((B, n_out, *self.out_shape), y.dtype)
        out = out.at[:, np.asarray(pred_idx)].set(y)

        # ---- water channel clamping (ref :1062-1080)
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
