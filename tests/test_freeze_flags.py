"""FCN3 staged-training freeze flags (ref fourcastnet3.py:688-689,886-899).

``freeze_encoder`` / ``freeze_processor`` freeze parameter groups via optax
masked zero-updates: frozen params must be bit-identical after an optimizer
step while gradients still flow through them to the trainable groups.
"""

import numpy as np

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import optax

from makani_tpu.models.model_registry import get_model
from makani_tpu.utils.loss import LossHandler
from makani_tpu.utils.training.optimizer import get_optimizer
from makani_tpu.utils.yparams import ParamsBase, YParams


def _fcn3_params(**over):
    names = ["u10m", "v10m", "t2m", "u500", "v500", "z500", "q500", "t500"]
    cfg = dict(
        nettype="FCN3",
        img_shape_x=16,
        img_shape_y=32,
        scale_factor=2,
        atmo_embed_dim=4,
        surf_embed_dim=6,
        aux_embed_dim=4,
        num_layers=2,
        kernel_shape=[3, 3],
        channel_names=names,
        in_channels=list(range(len(names))),
        out_channels=list(range(len(names))),
        n_history=0,
        n_future=0,
        add_zenith=True,
        losses=[{"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}}],
        lr=1e-2,
        optimizer_type="Adam",
        scheduler="none",
        multistep={"push_forward": False},
    )
    cfg.update(over)
    return ParamsBase(cfg)


def _one_step(params):
    model, _ = get_model(params, multistep=True)
    loss_obj = LossHandler(params)
    rng = np.random.RandomState(0)
    H, W = params["img_shape_x"], params["img_shape_y"]
    C = len(params["channel_names"])
    x = jnp.asarray(rng.randn(1, C, H, W), jnp.float32)
    zen = jnp.asarray(rng.randn(1, 1, 1, H, W), jnp.float32)
    tar = jnp.asarray(rng.randn(1, C, H, W), jnp.float32)

    p0 = model.init(jax.random.PRNGKey(0), x, zen)
    tx, _ = get_optimizer(params, p0)
    opt_state = tx.init(p0)

    def loss_fn(p):
        return loss_obj(model.apply(p, x, zen, train=True), tar, inp=x, train=True)

    grads = jax.grad(loss_fn)(p0)
    updates, _ = tx.update(grads, opt_state, p0)
    p1 = optax.apply_updates(p0, updates)
    return p0, p1, grads


def _leaf_groups(tree):
    enc, proc, other = [], [], []
    for path, leaf in jtu.tree_flatten_with_path(tree)[0]:
        comps = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        if any(("encoder" in c or "decoder" in c or c == "residual_transform") for c in comps):
            enc.append((jtu.keystr(path), leaf))
        elif any(c.startswith("block") for c in comps):
            proc.append((jtu.keystr(path), leaf))
        else:
            other.append((jtu.keystr(path), leaf))
    return enc, proc, other


def test_freeze_encoder_keeps_encoder_bits_and_updates_processor():
    params = _fcn3_params(freeze_encoder=True)
    p0, p1, grads = _one_step(params)
    enc0, proc0, _ = _leaf_groups(p0)
    enc1, proc1, _ = _leaf_groups(p1)
    assert enc0 and proc0
    for (name, a), (_, b) in zip(enc0, enc1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    changed = sum(not np.array_equal(np.asarray(a), np.asarray(b)) for (_, a), (_, b) in zip(proc0, proc1))
    assert changed > 0, "processor params should still update"
    # grads must still flow THROUGH the frozen encoder (requires_grad
    # semantics, not stop_gradient): encoder grads are nonzero even if unused
    enc_g, _, _ = _leaf_groups(grads)
    assert any(float(jnp.abs(g).max()) > 0 for _, g in enc_g)


def test_freeze_processor_keeps_block_bits_and_updates_encoder():
    params = _fcn3_params(freeze_processor=True)
    p0, p1, _ = _one_step(params)
    enc0, proc0, _ = _leaf_groups(p0)
    enc1, proc1, _ = _leaf_groups(p1)
    for (name, a), (_, b) in zip(proc0, proc1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    changed = sum(not np.array_equal(np.asarray(a), np.asarray(b)) for (_, a), (_, b) in zip(enc0, enc1))
    assert changed > 0, "encoder params should still update"


def test_unfrozen_baseline_updates_everything():
    params = _fcn3_params()
    p0, p1, _ = _one_step(params)
    enc0, proc0, _ = _leaf_groups(p0)
    enc1, proc1, _ = _leaf_groups(p1)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b)) for (_, a), (_, b) in zip(enc0, enc1))
    assert any(not np.array_equal(np.asarray(a), np.asarray(b)) for (_, a), (_, b) in zip(proc0, proc1))


def test_staged_finetune_config_builds():
    cfg = YParams("config/fourcastnet3.yaml", "fcn3_sc2_edim45_layers10_finetune")
    assert cfg.get("freeze_encoder") is True
    assert cfg.get("n_future") == 3
