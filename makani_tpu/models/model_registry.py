"""Model registry and factory (ref makani/models/model_registry.py:36-275).

Maps nettype strings onto flax module constructors, derives the effective
input/output channel counts from the config (history, zenith, static
features — ref utils/driver.py:174-269), and wraps the core network in the
single- or multi-step wrapper together with its preprocessor.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from makani_tpu.models.preprocessor import Preprocessor2D
from makani_tpu.models.stepper import MultiStepWrapper, SingleStepWrapper
from makani_tpu.utils.features import get_auxiliary_channels

__all__ = ["register_model", "list_models", "get_model_handle", "get_model"]

_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str, handle: Callable):
    if name in _REGISTRY:
        raise ValueError(f"model {name} already registered")
    _REGISTRY[name] = handle


def list_models():
    _populate()
    return sorted(_REGISTRY)


def _populate():
    if _REGISTRY:
        return
    from makani_tpu.models.networks.debug import DebugNet
    from makani_tpu.models.networks.sfnonet import FourierNeuralOperatorNet, SphericalFourierNeuralOperatorNet

    _REGISTRY["SFNO"] = SphericalFourierNeuralOperatorNet
    _REGISTRY["FNO"] = FourierNeuralOperatorNet
    _REGISTRY["DebugNet"] = DebugNet
    # registered lazily to keep import costs down
    for name, path in [
        ("AFNO", "makani_tpu.models.networks.afnonet:AdaptiveFourierNeuralOperatorNet"),
        ("AFNOv2", "makani_tpu.models.networks.afnonet_v2:AdaptiveFourierNeuralOperatorNetV2"),
        ("ViT", "makani_tpu.models.networks.vit:VisionTransformer"),
        ("SNO", "makani_tpu.models.networks.snonet:SphericalNeuralOperatorNet"),
        ("FCN3", "makani_tpu.models.networks.fourcastnet3:AtmoSphericNeuralOperatorNet"),
        ("FCN3.1", "makani_tpu.models.networks.fourcastnet3_1:AtmoSphericNeuralOperatorNet31"),
        ("Pangu", "makani_tpu.models.networks.pangu:Pangu"),
        ("PanguOnnx", "makani_tpu.models.networks.pangu_onnx:PanguOnnx"),
    ]:
        _REGISTRY[name] = path
    _load_entrypoint_models()


def _load_entrypoint_models():
    """Third-party models via the ``makani_tpu.models`` entry-point group
    (the reference's ``makani.models`` group, ref pyproject.toml:191-201):
    installed packages can register nettypes without forking the framework.
    Lazily resolved: the entry point's ``module:attr`` string goes into the
    registry and imports on first use."""
    try:
        from importlib.metadata import entry_points

        eps = entry_points(group="makani_tpu.models")
    except Exception:
        return
    for ep in eps:
        if ep.name not in _REGISTRY:
            _REGISTRY[ep.name] = ep.value


def get_model_handle(nettype: str):
    _populate()
    if nettype not in _REGISTRY:
        raise ValueError(f"unknown model {nettype}; available: {list_models()}")
    handle = _REGISTRY[nettype]
    if isinstance(handle, str):
        mod_name, cls_name = handle.split(":")
        import importlib

        handle = getattr(importlib.import_module(mod_name), cls_name)
        _REGISTRY[nettype] = handle
    return handle


def count_channels(params, preprocessor: Preprocessor2D):
    """Effective in/out channel counts seen by the core network
    (ref driver.py:174-269)."""
    n_prog = len(params.get("in_channels", range(params.get("N_in_channels", 0)))) or params.get("n_channels", 0)
    n_hist = params.get("n_history", 0) + 1

    aux = get_auxiliary_channels(
        add_zenith=params.get("add_zenith", False),
        n_noise_chan=(params.get("input_noise", {}) or {}).get("n_channels", 0)
        if (params.get("input_noise", {}) or {}).get("mode", "concatenate") == "concatenate"
        else 0,
    )
    n_dyn_aux = len(aux)
    n_static = preprocessor.n_static_channels

    n_in = n_hist * (n_prog + n_dyn_aux) + n_static
    n_out = len(params.get("out_channels", range(n_prog)))
    return n_in, n_out


def normalize_resampled_shapes(params):
    """Fold reference-style resampled shape keys into ``img_shape_{x,y}``.

    The reference's loader keeps the native grid in ``img_shape_{x,y}`` and
    the model grid in ``img_shape_{x,y}_resampled`` when ``subsampling_factor``
    > 1 (ref data_loader_multifiles.py:475-482, YParams.py:118
    ensure_resampled_shapes); its model builders consume the resampled pair
    (ref model_registry.py:167-170). This repo's single-name convention is
    that ``img_shape_{x,y}`` IS the model grid (the loader subsamples before
    publishing it), so configs written by the reference — model packages,
    converted checkpoints — must have the resampled values folded in before
    a model is built. A no-op for configs without the resampled keys.
    """
    for axis in ("x", "y"):
        rs = params.get(f"img_shape_{axis}_resampled")
        if rs is not None:
            params[f"img_shape_{axis}"] = int(rs)
    return params


def get_model(params, multistep: bool = False):
    """Build (wrapper_module, preprocessor) from a params object."""
    normalize_resampled_shapes(params)
    nettype = params.get("nettype", "SFNO")
    handle = get_model_handle(nettype)

    preprocessor = Preprocessor2D(params)
    n_in, n_out = count_channels(params, preprocessor)
    params["N_in_channels"] = n_in
    params["N_out_channels"] = n_out

    inp_shape = (params.get("img_shape_x"), params.get("img_shape_y"))
    out_shape = (params.get("out_shape_x", inp_shape[0]), params.get("out_shape_y", inp_shape[1]))

    kwargs = dict(
        inp_shape=inp_shape,
        out_shape=out_shape,
        inp_chans=n_in,
        out_chans=n_out,
    )
    # forward every config key the model declares as a field
    fields = set(getattr(handle, "__dataclass_fields__", {}))
    for key in (
        "spectral_transform",
        "model_grid_type",
        "sht_grid_type",
        "filter_type",
        "operator_type",
        "scale_factor",
        "embed_dim",
        "num_layers",
        "use_mlp",
        "mlp_ratio",
        "encoder_ratio",
        "decoder_ratio",
        "activation_function",
        "encoder_layers",
        "pos_embed",
        "pos_drop_rate",
        "path_drop_rate",
        "mlp_drop_rate",
        "normalization_layer",
        "max_modes",
        "hard_thresholding_fraction",
        "big_skip",
        "channels_last",
        "separable",
        "complex_activation",
        "spectral_layers",
        "checkpointing_level",
        "num_groups",
        "patch_size",
        "depth",
        "depth_layers",
        "num_heads",
        "window_size",
        "skip_fno",
        "nested_skip_fno",
        "num_blocks",
        "sparsity_threshold",
        "kernel_shape",
        "encoder_kernel_shape",
        "sfno_block_frequency",
        "atmo_embed_dim",
        "surf_embed_dim",
        "aux_embed_dim",
        "pos_embed_dim",
        "lmax",
        "n_history",
        "resample_sht",
        "encoder_bias",
        "layer_scale",
        "onnx_file",
        "remat_policy",
    ):
        if key in fields and params.get(key, None) is not None:
            kwargs[key] = params.get(key)
    if "use_bias" in fields and params.get("bias", None) is not None:
        kwargs["use_bias"] = params.get("bias")
    # channel-grouped models (FCN3/SNO) need the channel name lists
    if "channel_names" in fields:
        kwargs["channel_names"] = tuple(params.get("channel_names"))
    if "aux_channel_names" in fields:
        noise_cfg = params.get("input_noise", {}) or {}
        kwargs["aux_channel_names"] = tuple(
            get_auxiliary_channels(
                add_zenith=params.get("add_zenith", False),
                add_grid=params.get("add_grid", False),
                grid_type=params.get("gridtype", None),
                grid_num_frequencies=params.get("grid_num_frequencies", 0),
                add_orography=params.get("add_orography", False),
                add_landmask=params.get("add_landmask", False),
                landmask_preprocessing=params.get("landmask_preprocessing", "floor"),
                n_noise_chan=noise_cfg.get("n_channels", 0) if noise_cfg.get("mode", "concatenate") == "concatenate" else 0,
            )
        )
    if "clamp_water" in fields and params.get("clamp_water", None) is not None:
        kwargs["clamp_water"] = params.get("clamp_water")
    if "filter_basis_norm_mode" in fields and params.get("filter_basis_norm_mode", None) is not None:
        kwargs["filter_basis_norm_mode"] = params.get("filter_basis_norm_mode")
    if "filter_basis_type" in fields and params.get("filter_basis_type", None) is not None:
        kwargs["filter_basis_type"] = params.get("filter_basis_type")
    if "filter_basis_type" in fields and params.get("filter_basis_table", None) is not None:
        # exact import of a foreign (torch-harmonics) basis convention:
        # an npz exported by scripts/export_th_filter_basis.py overrides the
        # named family with interpolated tabulated values
        from makani_tpu.ops.disco import load_basis_table

        kwargs["filter_basis_type"] = load_basis_table(params.get("filter_basis_table"))
    if "dtype" in fields:
        compute_dtype = params.get("compute_dtype", "float32")
        if compute_dtype == "fp8":
            # fp8 pointwise GEMMs (TE-recipe equivalent, ops/fp8.py) on a bf16
            # activation stream — the same split as the reference's
            # "bf16-fp8recipe" AMP mode (ref utils/precision.py:89-167)
            from makani_tpu.ops import fp8 as _fp8

            _fp8.set_fp8(True)
            kwargs["dtype"] = jnp.bfloat16
        else:
            kwargs["dtype"] = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[compute_dtype]

    model = handle(**{k: v for k, v in kwargs.items() if k in fields})

    # physics constraints wrapper (ref model_registry.py: ConstraintsWrapper injection)
    constraints_cfg = params.get("constraints", None)
    if constraints_cfg:
        from makani_tpu.models.parametrizations import ConstraintsWrapper, build_constraints

        from makani_tpu.utils.dataloaders.data_helpers import get_out_normalization, out_channel_names

        bias = scale = None
        try:
            # constraints act on model outputs -> out_channels row order
            bias, scale = get_out_normalization(params)
        except Exception:
            pass
        names = out_channel_names(params)
        model = ConstraintsWrapper(model=model, constraints=tuple(build_constraints(constraints_cfg, names, bias, scale)))

    if multistep:
        ms = params.get("multistep", {"push_forward": False}) or {"push_forward": False}
        wrapper = MultiStepWrapper(
            model=model,
            preprocessor=preprocessor,
            n_future=params.get("n_future", 0),
            push_forward=ms.get("push_forward", False),
            multistep_checkpoint=params.get("multistep_checkpoint", False),
            use_scan=ms.get("use_scan", False),
        )
    else:
        wrapper = SingleStepWrapper(model=model, preprocessor=preprocessor)

    return wrapper, preprocessor
