"""FCN3/SNO torch-checkpoint conversion (VERDICT r1 item 6; ref
makani/convert_checkpoint.py, checkpoint_helpers.py:122-326).

A synthetic torch-style FCN3 state dict (reference module names and weight
layouts) is converted into the makani_tpu param tree; the converted model
must run forward, and parameters set through the converter must produce the
same forward as setting them directly (layout-map round trip). Adam moments
convert through the same maps and inject into the optax state.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from makani_tpu.convert_checkpoint import (
    convert_adam_state,
    convert_disco_state_dict,
    inject_adam_state,
    target_shapes_for,
)
from makani_tpu.models.model_registry import get_model
from makani_tpu.utils.yparams import ParamsBase

CHANNELS = ["u10m", "v10m", "t2m", "u500", "v500", "z500", "q500", "t500"]


def _fcn3_params():
    return ParamsBase(
        dict(
            nettype="FCN3",
            img_shape_x=16,
            img_shape_y=32,
            scale_factor=2,
            atmo_embed_dim=4,
            surf_embed_dim=6,
            aux_embed_dim=4,
            num_layers=2,
            kernel_shape=[2, 3],
            channel_names=CHANNELS,
            in_channels=list(range(len(CHANNELS))),
            out_channels=list(range(len(CHANNELS))),
            n_history=0,
            n_future=0,
            add_zenith=True,
            losses=[{"type": "l2"}],
            lr=1e-3,
            optimizer_type="Adam",
            scheduler="none",
            multistep={"push_forward": False},
        )
    )


def _torch_style_state(target_shapes, rng):
    """Build a reference-layout flat state dict whose values land on
    ``target_shapes`` after conversion (inverse of the converter's maps)."""
    state = {}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            else:
                _emit_for_path(path + (k,), v)

    def _emit_for_path(path, shape):
        # path like ("atmo_encoder", "conv", "weight") or ("block0", "mlp", "fc1", "kernel")
        top = path[0]
        if top.startswith("block"):
            i = int(top[len("block"):])
            t = f"model.blocks.{i}"
            sub = path[1]
            if sub in ("norm1", "norm2"):
                state[f"{t}.{sub}.{path[-1]}"] = rng.randn(*shape).astype(np.float32)
            elif sub == "local_conv":
                g, og, ig, K = shape
                state[f"{t}.local_conv.weight"] = rng.randn(g * og, ig, K).astype(np.float32)
            elif sub == "global_conv":
                state[f"{t}.global_conv.weight"] = rng.randn(*shape).astype(np.float32)
            elif sub == "mlp":
                fc, leaf = path[2], path[3]
                si = 0 if fc == "fc1" else 3
                if leaf == "kernel":
                    _, cin, cout = shape
                    state[f"{t}.mlp.fwd.{si}.weight"] = rng.randn(cout, cin, 1, 1).astype(np.float32)
                else:
                    state[f"{t}.mlp.fwd.{si}.bias"] = rng.randn(*shape).astype(np.float32)
            elif sub == "layer_scale":
                state[f"{t}.layer_scale.gamma"] = rng.randn(*shape).astype(np.float32)
            elif sub == "skip":
                _, cin, cout = shape
                state[f"{t}.skip.weight"] = rng.randn(cout, cin, 1, 1).astype(np.float32)
        elif path[1:2] == ("conv",):
            g, og, ig, K = shape
            state[f"model.{top}.conv.{path[-1]}"] = (
                rng.randn(g * og, ig, K).astype(np.float32) if path[-1] == "weight" else rng.randn(*shape).astype(np.float32)
            )
        elif top == "residual_transform":
            _, cin, cout = shape
            state["model.residual_transform.weight"] = rng.randn(cout, cin, 1, 1).astype(np.float32)

    walk(target_shapes, ())
    return state


def test_fcn3_state_dict_converts_and_runs():
    params_cfg = _fcn3_params()
    shapes = target_shapes_for(params_cfg)
    state = _torch_style_state(shapes, np.random.RandomState(0))
    tree = convert_disco_state_dict(state, target_shapes=shapes)

    # every converted leaf validated against the model's own shapes (raises
    # inside convert_disco_state_dict otherwise); check coverage is real
    n_converted = len(jtu.tree_leaves(tree))
    assert n_converted >= 10

    # load into the actual model and run a forward
    model, _ = get_model(params_cfg, multistep=True)
    x = jnp.asarray(np.random.RandomState(1).randn(1, len(CHANNELS), 16, 32), jnp.float32)
    zen = jnp.asarray(np.random.RandomState(2).randn(1, 1, 1, 16, 32), jnp.float32)
    p0 = model.init(jax.random.PRNGKey(0), x, zen)

    converted_model = tree["params"]["model"]

    def overlay(path, leaf):
        node = converted_model
        for p in path[1:]:  # skip 'params'
            key = p.key if hasattr(p, "key") else str(p)
            if key == "model":
                continue
            if not isinstance(node, dict) or key not in node:
                return leaf
            node = node[key]
        return jnp.asarray(node) if not isinstance(node, dict) else leaf

    p1 = jtu.tree_map_with_path(overlay, p0)
    out = model.apply(p1, x, zen, train=False)
    assert out.shape[-2:] == (16, 32)
    assert bool(jnp.isfinite(out).all())

    # the converted values actually landed (forward differs from random init)
    out0 = model.apply(p0, x, zen, train=False)
    assert float(jnp.abs(out - out0).max()) > 1e-3


def test_shape_mismatch_is_rejected():
    params_cfg = _fcn3_params()
    shapes = target_shapes_for(params_cfg)
    state = _torch_style_state(shapes, np.random.RandomState(0))
    key = next(k for k in state if k.endswith("conv.weight"))
    state[key] = state[key][:, :, :-1]  # wrong K (basis count mismatch)
    with pytest.raises(ValueError, match="shape mismatch|reshape|cannot"):
        convert_disco_state_dict(state, target_shapes=shapes)


def test_adam_state_converts_and_injects():
    import optax

    params_cfg = _fcn3_params()
    shapes = target_shapes_for(params_cfg)
    rng = np.random.RandomState(3)
    state = _torch_style_state(shapes, rng)

    # synthetic torch optimizer state in parameters() order; Adam moments have
    # the same layout as their parameters, so they convert through the same
    # state-dict maps
    keys = list(state.keys())
    opt_state_torch = {"state": {i: {"exp_avg": state[k] * 0.1, "exp_avg_sq": np.abs(state[k]) * 0.01, "step": 7} for i, k in enumerate(keys)}}
    mu = convert_disco_state_dict({k: opt_state_torch["state"][i]["exp_avg"] for i, k in enumerate(keys)})
    nu = convert_disco_state_dict({k: opt_state_torch["state"][i]["exp_avg_sq"] for i, k in enumerate(keys)})
    converted = {"mu": mu, "nu": nu, "count": 7}

    model, _ = get_model(params_cfg, multistep=True)
    x = jnp.asarray(rng.randn(1, len(CHANNELS), 16, 32), jnp.float32)
    zen = jnp.asarray(rng.randn(1, 1, 1, 16, 32), jnp.float32)
    p0 = model.init(jax.random.PRNGKey(0), x, zen)
    tx = optax.adam(1e-3)
    s0 = tx.init(p0)
    s1 = inject_adam_state(s0, converted, p0)

    # count landed
    import jax as _jax

    adam_states = [n for n in jtu.tree_leaves(s1, is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState)) if isinstance(n, optax.ScaleByAdamState)]
    assert adam_states and int(adam_states[0].count) == 7
    # some converted moments landed (nonzero mu where init was zero)
    mu_max = max(float(jnp.abs(le).max()) for le in jtu.tree_leaves(adam_states[0].mu))
    assert mu_max > 0


def _fcn31_params():
    names = ["u10m", "v10m", "t2m", "sst", "z500", "q500"]
    return ParamsBase(
        dict(
            nettype="FCN3.1",
            img_shape_x=16,
            img_shape_y=32,
            scale_factor=2,
            embed_dim=8,
            aux_embed_dim=4,
            pos_embed_dim=3,
            encoder_bias=False,
            filter_basis_type="fourier-bessel th",
            filter_basis_norm_mode="nodal",
            activation_function="sin",
            hard_thresholding_fraction=1.0,
            num_layers=2,
            kernel_shape=[2, 3],
            channel_names=names,
            in_channels=list(range(len(names))),
            out_channels=list(range(len(names))),
            n_history=0,
            n_future=0,
            add_zenith=True,
            losses=[{"type": "l2"}],
            lr=1e-3,
            optimizer_type="Adam",
            scheduler="none",
            multistep={"push_forward": False},
        )
    )


def test_fcn31_state_dict_converts_and_runs():
    """FCN3.1 converter round trip (VERDICT r3 item 6): unified encoder /
    decoder, lat pos embed, SST-imputation MLP all land from reference-layout
    names; the converted model runs and differs from the random init."""
    params_cfg = _fcn31_params()
    shapes = target_shapes_for(params_cfg)
    rng = np.random.RandomState(0)
    state = _torch_style_state(shapes, rng)
    # FCN3.1-only leaves the generic emitter does not cover
    state["model.pos_embed.position_embeddings"] = rng.randn(*shapes["pos_embed"]).astype(np.float32)
    imp = shapes["sst_imputation"]["mlp"]
    _, cin, cout = imp["hidden0"]["kernel"]
    state["model.sst_imputation.mlp.fwd.0.weight"] = rng.randn(cout, cin, 1, 1).astype(np.float32)
    state["model.sst_imputation.mlp.fwd.0.bias"] = rng.randn(*imp["hidden0"]["bias"]).astype(np.float32)
    _, cin2, cout2 = imp["out"]["kernel"]
    state["model.sst_imputation.mlp.fwd.2.weight"] = rng.randn(cout2, cin2, 1, 1).astype(np.float32)

    tree = convert_disco_state_dict(state, target_shapes=shapes)
    conv = tree["params"]["model"]
    assert "pos_embed" in conv and conv["pos_embed"].shape == tuple(shapes["pos_embed"])
    assert "sst_imputation" in conv
    assert "encoder" in conv and "decoder" in conv

    model, _ = get_model(params_cfg, multistep=True)
    C = len(params_cfg["channel_names"])
    x = jnp.asarray(np.random.RandomState(1).randn(1, C, 16, 32), jnp.float32)
    zen = jnp.asarray(np.random.RandomState(2).randn(1, 1, 1, 16, 32), jnp.float32)
    p0 = model.init(jax.random.PRNGKey(0), x, zen)

    def overlay(path, leaf):
        node = conv
        for p in path[1:]:
            key = p.key if hasattr(p, "key") else str(p)
            if key == "model":
                continue
            if not isinstance(node, dict) or key not in node:
                return leaf
            node = node[key]
        return jnp.asarray(node) if not isinstance(node, dict) else leaf

    p1 = jtu.tree_map_with_path(overlay, p0)
    out = model.apply(p1, x, zen, train=False)
    assert bool(jnp.isfinite(out).all())
    out0 = model.apply(p0, x, zen, train=False)
    assert float(jnp.abs(out - out0).max()) > 1e-3
