"""Convert reference makani (PyTorch) checkpoints to makani_tpu parameters
(ref makani/convert_checkpoint.py, repurposed: instead of merging legacy
model-parallel shards, this converts across frameworks).

Supported:
  * SFNO/FNO-family checkpoints (the flagship lineage) —
    ``convert_sfno_state_dict``.
  * FCN3/SNO (DISCO) family — ``convert_disco_state_dict``: the channel-
    grouped DISCO encoders/decoders, local/global processor blocks, layer
    scales and skips. DISCO filter weights map 1:1 onto our basis slots
    (shape (groups*out, in/groups, K) -> (groups, out, in/groups, K)).

    Exactness status per filter-basis family (torch-harmonics itself is not
    installable here, so "exact" means: validated to fp32 tolerance against
    an independent dense implementation of the documented torch-harmonics
    >= 0.9 convention — tests/test_convert_parity.py):

      - **guaranteed-exact path (any family, any th version)**: export the
        basis values where torch-harmonics IS installed
        (``scripts/export_th_filter_basis.py``) and set
        ``filter_basis_table: <file>.npz`` in the target config — the model
        then interpolates the reference install's own basis values
        (ops/disco.py tabulated basis; ~1e-6 interpolation error for the
        smooth families).
      - ``piecewise linear`` / ``morlet`` / ``zernike`` / ``fourier-bessel``
        checkpoints: import with ``filter_basis_type`` set to the matching
        ``"... th"`` convention ("piecewise linear th", "morlet th",
        "zernike th", "fourier-bessel th" — ops/disco.py). These re-derive
        the torch-harmonics layouts AND values (e.g. piecewise linear:
        n_r nodes across the kernel *diameter* at spacing
        2*cutoff/(n_r+1), isotropic center for odd n_r); they are validated
        against an independent dense realization of the documented
        convention, but not diffed against live torch-harmonics output —
        for certainty use the tabulated path above.
      - Our default families (``"piecewise linear"`` etc. without "th") use
        different parametrizations (cos/sin azimuthal harmonics, uniform
        K = 1+(n_r-1)*n_phi layout) and are NOT weight-compatible with
        reference checkpoints.
  * Adam optimizer state (exp_avg/exp_avg_sq) —
    ``convert_adam_state``/``inject_adam_state``: moments transform with the
    same layout maps as their parameters and are injected into the optax
    chain (ref checkpoint_helpers.py:122-326 optimizer gather/scatter).

The mapping is structural — both frameworks use the same architecture,
orthonormal SHT convention, and dhconv contraction, so weights transfer 1:1
up to layout:

    torch Conv2d (out, in, 1, 1)  -> Conv1x1 kernel (1, in, out)
    torch Linear (out, in)        -> Dense kernel (in, out)
    complex spectral weight       -> trailing [re, im] pair
    EncoderDecoder Sequential fwd.{0,2,...} -> encoder hidden{i}/out
    MLP Sequential fwd.{0,3}      -> mlp fc1/fc2
    DISCO conv (g*og, ig, K)      -> (g, og, ig, K)

Usage:
    python -m makani_tpu.convert_checkpoint --input ckpt_mp0_v0.tar \
        --output params_dir [--nettype FCN3 --yaml_config ... --config ...]
"""

from __future__ import annotations

import argparse
import re
from typing import Dict, Optional

import numpy as np

__all__ = [
    "convert_sfno_state_dict",
    "convert_disco_state_dict",
    "convert_adam_state",
    "inject_adam_state",
    "load_torch_checkpoint",
]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into numpy arrays (no torch tensors leak)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state", ckpt.get("model_state_dict", ckpt))
    out = {}
    for k, v in state.items():
        # canonicalize wrapper prefixes (ref driver.py:585-599)
        k = k.replace("_orig_mod.", "").replace("module.", "")
        if hasattr(v, "numpy"):
            arr = v.detach().cpu()
            if arr.is_complex():
                arr = np.stack([arr.real.numpy(), arr.imag.numpy()], axis=-1)
            else:
                arr = arr.numpy()
        else:
            arr = np.asarray(v)
        out[k] = arr
    return out


def _conv1x1(w: np.ndarray) -> np.ndarray:
    """(out, in, 1, 1) -> (1, in, out)."""
    return np.ascontiguousarray(np.transpose(w[:, :, 0, 0], (1, 0)))[None]


def convert_sfno_state_dict(state: Dict[str, np.ndarray], encoder_layers: int = 1, channels_last: bool = True) -> dict:
    """Map a makani SFNO/FNO state dict onto the makani_tpu param pytree.

    Returns a nested dict matching ``SingleStepWrapper``/``MultiStepWrapper``
    variables: {"params": {"model": {...}}}.

    ``channels_last``: layout of the *target* model. The only
    layout-dependent parameter is a direct ``pos_embed`` — torch stores it
    (1, C, H, W); the channels-last model (the default) stores (1, H, W, C).
    """
    model: dict = {}

    def put(path, value):
        node = model
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    def map_encdec(prefix_t, prefix_o):
        # Sequential indices: conv at 2*i for hidden layers, final conv last
        idxs = sorted(
            {int(m.group(1)) for k in state for m in [re.match(rf"{prefix_t}\.fwd\.(\d+)\.weight", k)] if m}
        )
        for j, si in enumerate(idxs):
            w = state[f"{prefix_t}.fwd.{si}.weight"]
            is_last = j == len(idxs) - 1
            name = "out" if is_last else f"hidden{j}"
            put((prefix_o, name, "kernel"), _conv1x1(w))
            bkey = f"{prefix_t}.fwd.{si}.bias"
            if bkey in state:
                put((prefix_o, name, "bias"), state[bkey])

    map_encdec("model.encoder", "encoder")
    map_encdec("model.decoder", "decoder")

    # blocks
    block_ids = sorted({int(m.group(1)) for k in state for m in [re.match(r"model\.blocks\.(\d+)\.", k)] if m})
    for i in block_ids:
        t = f"model.blocks.{i}"
        o = f"block{i}"
        # spectral filter weight: complex -> split pair already done at load
        w = state[f"{t}.filter.filter.weight"]
        put((o, "filter_layer", "filter", "weight"), w)
        if f"{t}.filter.filter.bias" in state:
            put((o, "filter_layer", "filter", "bias"), state[f"{t}.filter.filter.bias"])
        # norms
        for norm in ("norm0", "norm1"):
            if f"{t}.{norm}.weight" in state:
                put((o, norm, "weight"), state[f"{t}.{norm}.weight"])
                put((o, norm, "bias"), state[f"{t}.{norm}.bias"])
        # skips
        for skip in ("inner_skip", "outer_skip"):
            if f"{t}.{skip}.weight" in state:
                put((o, skip, "kernel"), _conv1x1(state[f"{t}.{skip}.weight"]))
        # mlp: Sequential[fc1, act, drop, fc2, drop]
        if f"{t}.mlp.fwd.0.weight" in state:
            put((o, "mlp", "fc1", "kernel"), _conv1x1(state[f"{t}.mlp.fwd.0.weight"]))
            put((o, "mlp", "fc1", "bias"), state[f"{t}.mlp.fwd.0.bias"])
            put((o, "mlp", "fc2", "kernel"), _conv1x1(state[f"{t}.mlp.fwd.3.weight"]))
            if f"{t}.mlp.fwd.3.bias" in state:
                put((o, "mlp", "fc2", "bias"), state[f"{t}.mlp.fwd.3.bias"])

    if "model.residual_transform.weight" in state:
        put(("residual_transform", "kernel"), _conv1x1(state["model.residual_transform.weight"]))
    if "model.pos_embed" in state:
        pe = state["model.pos_embed"]
        if channels_last and pe.ndim == 4:
            pe = np.ascontiguousarray(np.transpose(pe, (0, 2, 3, 1)))  # NCHW -> NHWC
        put(("pos_embed",), pe)

    return {"params": {"model": model}}


def _disco_conv_weight(w: np.ndarray, groups: int) -> np.ndarray:
    """torch-harmonics DISCO conv weight (g*out_g, in_g, K) -> ours
    (g, out_g, in_g, K)."""
    go, ig, K = w.shape
    return np.ascontiguousarray(w.reshape(groups, go // groups, ig, K))


def convert_disco_state_dict(state: Dict[str, np.ndarray], target_shapes: Optional[dict] = None) -> dict:
    """Map a makani FCN3/SNO (DISCO-family) state dict onto the makani_tpu
    param pytree (module names mirror the reference: fourcastnet3.py:659-1135).

    ``target_shapes``: optional pytree of target leaf shapes (from
    ``jax.eval_shape`` of the configured model) used to infer DISCO group
    counts and validate every mapped leaf.
    """
    model: dict = {}

    def put(path, value):
        node = model
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    def target_shape(path):
        if target_shapes is None:
            return None
        node = target_shapes
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        return tuple(node) if not isinstance(node, dict) else None

    def disco_groups(path, torch_w):
        ts = target_shape(path)
        return ts[0] if ts is not None else 1

    def map_disco_module(prefix_t, prefix_o):
        """conv (+ bias) + optional encoder/decoder MLP of a DISCO module."""
        wkey = f"{prefix_t}.conv.weight"
        if wkey not in state:
            return False
        g = disco_groups((prefix_o, "conv", "weight"), state[wkey])
        put((prefix_o, "conv", "weight"), _disco_conv_weight(state[wkey], g))
        if f"{prefix_t}.conv.bias" in state:
            put((prefix_o, "conv", "bias"), state[f"{prefix_t}.conv.bias"])
        # encoder/decoder MLP is an EncoderDecoder: Sequential fwd.{0,2}
        if f"{prefix_t}.mlp.fwd.0.weight" in state:
            put((prefix_o, "mlp", "hidden0", "kernel"), _conv1x1(state[f"{prefix_t}.mlp.fwd.0.weight"]))
            if f"{prefix_t}.mlp.fwd.0.bias" in state:
                put((prefix_o, "mlp", "hidden0", "bias"), state[f"{prefix_t}.mlp.fwd.0.bias"])
            put((prefix_o, "mlp", "out", "kernel"), _conv1x1(state[f"{prefix_t}.mlp.fwd.2.weight"]))
        return True

    # channel-grouped encoders/decoders (FCN3) and the single pair (SNO)
    for name in ("atmo_encoder", "surf_encoder", "aux_encoder", "atmo_decoder", "surf_decoder", "encoder", "decoder"):
        map_disco_module(f"model.{name}", name)

    # processor blocks
    block_ids = sorted({int(m.group(1)) for k in state for m in [re.match(r"model\.blocks\.(\d+)\.", k)] if m})
    for i in block_ids:
        t = f"model.blocks.{i}"
        o = f"block{i}"
        for norm in ("norm1", "norm2"):
            if f"{t}.{norm}.weight" in state:
                put((o, norm, "weight"), state[f"{t}.{norm}.weight"].reshape(-1))
                put((o, norm, "bias"), state[f"{t}.{norm}.bias"].reshape(-1))
        if f"{t}.local_conv.weight" in state:
            g = disco_groups((o, "local_conv", "weight"), state[f"{t}.local_conv.weight"])
            put((o, "local_conv", "weight"), _disco_conv_weight(state[f"{t}.local_conv.weight"], g))
            if f"{t}.local_conv.bias" in state:
                put((o, "local_conv", "bias"), state[f"{t}.local_conv.bias"])
        if f"{t}.global_conv.weight" in state:
            # complex dhconv weight arrives split (g, in_g, out_g, L, 2)
            put((o, "global_conv", "weight"), state[f"{t}.global_conv.weight"])
        if f"{t}.mlp.fwd.0.weight" in state:
            put((o, "mlp", "fc1", "kernel"), _conv1x1(state[f"{t}.mlp.fwd.0.weight"]))
            put((o, "mlp", "fc1", "bias"), state[f"{t}.mlp.fwd.0.bias"])
            put((o, "mlp", "fc2", "kernel"), _conv1x1(state[f"{t}.mlp.fwd.3.weight"]))
            if f"{t}.mlp.fwd.3.bias" in state:
                put((o, "mlp", "fc2", "bias"), state[f"{t}.mlp.fwd.3.bias"])
        for pname in ("layer_scale.gamma", "layer_scale.weight"):
            if f"{t}.{pname}" in state:
                put((o, "layer_scale", "gamma"), state[f"{t}.{pname}"].reshape(1, -1, 1, 1))
        if f"{t}.skip.weight" in state:
            put((o, "skip", "kernel"), _conv1x1(state[f"{t}.skip.weight"]))

    if "model.residual_transform.weight" in state:
        put(("residual_transform", "kernel"), _conv1x1(state["model.residual_transform.weight"]))

    # FCN3.1 extras: learned lat position embedding (1, C, h, 1) transfers
    # verbatim (ref pos_embedding.py LearnablePositionEmbedding "lat") and
    # the SST-imputation MLP is a plain EncoderDecoder
    if "model.pos_embed.position_embeddings" in state:
        put(("pos_embed",), state["model.pos_embed.position_embeddings"])
    if "model.sst_imputation.mlp.fwd.0.weight" in state:
        put(("sst_imputation", "mlp", "hidden0", "kernel"), _conv1x1(state["model.sst_imputation.mlp.fwd.0.weight"]))
        if "model.sst_imputation.mlp.fwd.0.bias" in state:
            put(("sst_imputation", "mlp", "hidden0", "bias"), state["model.sst_imputation.mlp.fwd.0.bias"])
        put(("sst_imputation", "mlp", "out", "kernel"), _conv1x1(state["model.sst_imputation.mlp.fwd.2.weight"]))
        if "model.sst_imputation.mlp.fwd.2.bias" in state:
            put(("sst_imputation", "mlp", "out", "bias"), state["model.sst_imputation.mlp.fwd.2.bias"])

    tree = {"params": {"model": model}}
    if target_shapes is not None:
        _validate_shapes(model, target_shapes)
    return tree


def _validate_shapes(converted: dict, target: dict, path=()):
    for k, v in converted.items():
        if k not in target:
            raise ValueError(f"converted param {'/'.join(path + (k,))} not in target tree")
        if isinstance(v, dict):
            _validate_shapes(v, target[k], path + (k,))
        else:
            ts = tuple(target[k])
            if tuple(v.shape) != ts:
                raise ValueError(f"shape mismatch at {'/'.join(path + (k,))}: torch {v.shape} vs target {ts}")


def target_shapes_for(params_cfg) -> dict:
    """Leaf-shape pytree of the configured model (via eval_shape, no FLOPs)."""
    import jax
    import jax.numpy as jnp

    from makani_tpu.models.model_registry import get_model

    model, _ = get_model(params_cfg, multistep=False)
    H, W = params_cfg.get("img_shape_x"), params_cfg.get("img_shape_y")
    n_in = (params_cfg.get("n_history", 0) + 1) * len(params_cfg.get("in_channels"))
    from makani_tpu.models.preprocessor import get_unpredicted_channels

    n_dyn = get_unpredicted_channels(params_cfg)
    x = jnp.zeros((1, n_in, H, W), jnp.float32)
    zen = jnp.zeros((1, 1, n_dyn, H, W), jnp.float32) if n_dyn > 0 else None
    shapes = jax.eval_shape(lambda k: model.init(k, x, zen), jax.random.PRNGKey(0))
    return jax.tree.map(lambda s: tuple(s.shape), shapes)["params"]["model"]


# ---------------------------------------------------------------------------
# optimizer state (ref checkpoint_helpers.py:122-326 flexible optimizer format)
# ---------------------------------------------------------------------------


def convert_adam_state(ckpt: dict, param_key_order, transform_map) -> Optional[dict]:
    """Convert a torch Adam/AdamW state into (mu, nu, count) numpy trees.

    ``param_key_order``: the torch state-dict keys in ``model.parameters()``
    order (== state-dict insertion order for the reference models).
    ``transform_map``: {torch_key: (tpu_path, transform_fn)} — the exact same
    layout maps applied to the parameters. torch keys without optimizer state
    (frozen params) are skipped.
    """
    opt = ckpt.get("optimizer_state", ckpt.get("optimizer_state_dict", None))
    if opt is None or "state" not in opt:
        return None
    mu: dict = {}
    nu: dict = {}
    count = 0

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    for pid, key in enumerate(param_key_order):
        if pid not in opt["state"] or key not in transform_map:
            continue
        entry = opt["state"][pid]
        path, fn = transform_map[key]
        ea = entry.get("exp_avg")
        eas = entry.get("exp_avg_sq")
        if ea is None or eas is None:
            continue
        ea = ea.detach().cpu() if hasattr(ea, "detach") else ea
        eas = eas.detach().cpu() if hasattr(eas, "detach") else eas
        if hasattr(ea, "is_complex") and ea.is_complex():
            ea = np.stack([ea.real.numpy(), ea.imag.numpy()], axis=-1)
            eas = np.stack([eas.real.numpy(), eas.imag.numpy()], axis=-1)
        else:
            ea = np.asarray(ea)
            eas = np.asarray(eas)
        put(mu, path, fn(ea))
        put(nu, path, fn(eas))
        step = entry.get("step", 0)
        count = int(step if not hasattr(step, "item") else step.item())
    return {"mu": {"params": {"model": mu}}, "nu": {"params": {"model": nu}}, "count": count}


def inject_adam_state(opt_state, converted: dict, params_tree):
    """Replace the ScaleByAdamState moments inside an optax chain state with
    the converted torch moments (missing leaves keep their init values)."""
    import jax
    import optax

    def overlay(init_tree, new_tree):
        def visit(path, leaf):
            node = new_tree
            for p in path:
                key = p.key if hasattr(p, "key") else str(p)
                if not isinstance(node, dict) or key not in node:
                    return leaf
                node = node[key]
            return jax.numpy.asarray(node, leaf.dtype).reshape(leaf.shape) if not isinstance(node, dict) else leaf

        return jax.tree_util.tree_map_with_path(visit, init_tree)

    def fix(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=jax.numpy.asarray(converted["count"], node.count.dtype),
                mu=overlay(node.mu, converted["mu"]),
                nu=overlay(node.nu, converted["nu"]),
            )
        return node

    return jax.tree_util.tree_map(fix, opt_state, is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))


def _guard_th_basis(target_cfg, allow_rederived: bool = False) -> None:
    """Refuse a silent torch-harmonics-convention import.

    The reference's DISCO models bind torch-harmonics filter bases at runtime
    (ref makani/models/networks/fourcastnet3.py:189-205; the published recipe
    pins the basis via config, ref config/fourcastnet3.yaml:34). Importing
    such a checkpoint with this repo's *re-derived* basis is convention-exact
    only for the torch-harmonics version the derivation was checked against;
    a version drift would silently corrupt the imported filters. So a
    th-convention import must carry either a tabulated basis exported from
    the SOURCE install (``filter_basis_table``) or an explicit
    ``--allow_rederived_basis`` acknowledgement.
    """
    if allow_rederived:
        return
    if target_cfg is None:
        raise SystemExit(
            "convert_checkpoint: importing a DISCO-family checkpoint needs "
            "--yaml_config/--config so the filter-basis convention can be "
            "checked (or pass --allow_rederived_basis to skip the check)."
        )
    basis = target_cfg.get("filter_basis_type", None)
    table = target_cfg.get("filter_basis_table", None)
    if isinstance(basis, str) and basis.endswith(" th") and not table:
        raise SystemExit(
            f"convert_checkpoint: the target config requests the torch-harmonics "
            f"basis convention ({basis!r}) but sets no filter_basis_table. "
            f"Export the source install's basis (scripts/export_th_filter_basis.py, "
            f"protocol in docs/th_basis_import.md) and set filter_basis_table in "
            f"the config, or pass --allow_rederived_basis to accept the in-repo "
            f"re-derivation."
        )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="makani torch checkpoint (.tar)")
    parser.add_argument("--output", required=True, help="output orbax checkpoint dir")
    parser.add_argument("--nettype", default="SFNO", help="SFNO/FNO or FCN3/SNO family")
    parser.add_argument("--yaml_config", default=None)
    parser.add_argument("--config", default=None)
    parser.add_argument(
        "--channels_first",
        action="store_true",
        help="target model uses channels-first internals (channels_last=False); affects pos_embed layout",
    )
    parser.add_argument(
        "--allow_rederived_basis",
        action="store_true",
        help="import a torch-harmonics-convention DISCO checkpoint WITHOUT a "
        "tabulated basis (filter_basis_table), trusting the in-repo "
        "re-derivation of the th basis conventions. The re-derivations are "
        "parity-tested against dense references, but torch-harmonics itself "
        "drifts across versions — for an exact import, export the source "
        "install's basis with scripts/export_th_filter_basis.py and set "
        "filter_basis_table in the target config (see docs/th_basis_import.md).",
    )
    args = parser.parse_args()

    import os

    import orbax.checkpoint as ocp

    state = load_torch_checkpoint(args.input)
    if args.nettype.upper() in ("FCN3", "FCN3.1", "SNO"):
        target = None
        target_cfg = None
        if args.yaml_config and args.config:
            from makani_tpu.utils.yparams import YParams

            target_cfg = YParams(args.yaml_config, args.config)
            target = target_shapes_for(target_cfg)
        _guard_th_basis(target_cfg, allow_rederived=args.allow_rederived_basis)
        params = convert_disco_state_dict(state, target_shapes=target)
    else:
        params = convert_sfno_state_dict(state, channels_last=not args.channels_first)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.output), params)
    ckptr.wait_until_finished()
    n = sum(v.size for v in __import__("jax").tree.leaves(params))
    print(f"converted {n} parameters -> {args.output}")


if __name__ == "__main__":
    main()
