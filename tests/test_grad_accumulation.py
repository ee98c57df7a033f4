"""End-to-end gradient-accumulation equivalence (ref tests/test_models.py:66-123).

The reference asserts that k accumulation micro-steps over micro-batches
reproduce one optimizer step over the concatenated batch. Here the same
property is pinned through the real registry model + LossHandler +
get_optimizer stack: with ``grad_accumulation_steps=k`` (optax.MultiSteps
averages the k micro-grads), the parameters after k micro-steps must equal
one accum=1 step over the full batch, because the geometric-l2 loss is a
batch mean.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.model_registry import get_model
from makani_tpu.utils.loss import LossHandler
from makani_tpu.utils.training.optimizer import get_optimizer
from makani_tpu.utils.yparams import ParamsBase

NAMES = ["u10m", "v10m", "t2m", "z500", "q700"]
H, W, C, B = 16, 32, 5, 4


def _params(**over):
    base = dict(
        nettype="SFNO",
        img_shape_x=H,
        img_shape_y=W,
        scale_factor=2,
        embed_dim=8,
        num_layers=2,
        channel_names=NAMES,
        in_channels=list(range(C)),
        out_channels=list(range(C)),
        n_history=0,
        n_future=0,
        add_zenith=False,
        losses=[{"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}}],
        lr=1e-2,
        optimizer_type="Adam",
        scheduler="none",
        multistep={"push_forward": False},
    )
    base.update(over)
    return ParamsBase(base)


def _setup(accum):
    # SGD: the update is linear in the gradient, so micro-mean == full-batch
    # holds to fp32 rounding and the comparison can be tight (Adam's
    # g/sqrt(v) amplifies reduction-order noise ~1e-3 relative)
    params = _params(grad_accumulation_steps=accum, optimizer_type="SGD")
    model, _ = get_model(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    tar = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    loss_handler = LossHandler(params)
    tx, _ = get_optimizer(params, variables["params"])
    opt_state = tx.init(variables["params"])

    def step(p, opt_state, xb, tb):
        def loss_fn(p):
            pred = model.apply({**variables, "params": p}, xb)
            return loss_handler(pred, tb, inp=xb)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax_apply(p, updates), opt_state, loss

    return variables["params"], opt_state, jax.jit(step), x, tar


def optax_apply(p, updates):
    import optax

    return optax.apply_updates(p, updates)


def test_accumulated_micro_steps_match_full_batch_step():
    # accum=1, full batch
    p_full, s_full, step_full, x, tar = _setup(accum=1)
    p1, _, loss_full = step_full(p_full, s_full, x, tar)

    # accum=2, two micro-batches of B/2
    p_acc, s_acc, step_acc, _, _ = _setup(accum=2)
    # identical init (same PRNGKey) — sanity
    for a, b in zip(jax.tree_util.tree_leaves(p_full), jax.tree_util.tree_leaves(p_acc)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    losses = []
    p2, s2 = p_acc, s_acc
    for k in range(2):
        xb = x[k * B // 2 : (k + 1) * B // 2]
        tb = tar[k * B // 2 : (k + 1) * B // 2]
        p2, s2, lk = step_acc(p2, s2, xb, tb)
        losses.append(float(lk))
        if k == 0:
            # mid-accumulation: parameters must be untouched
            for a, b in zip(jax.tree_util.tree_leaves(p_acc), jax.tree_util.tree_leaves(p2)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the mean micro-loss equals the full-batch loss (batch-mean loss)
    np.testing.assert_allclose(np.mean(losses), float(loss_full), rtol=1e-5)

    # parameters after the flush match the single full-batch step
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)


def test_accumulation_with_grad_clipping_still_defers():
    """Clipping composes with MultiSteps: no update until the k-th call."""
    p0, s0, step, x, tar = _setup(accum=1)
    params = _params(grad_accumulation_steps=3, max_grad_norm=1e-3)
    model, _ = get_model(params)
    variables = model.init(jax.random.PRNGKey(0), x)
    loss_handler = LossHandler(params)
    tx, _ = get_optimizer(params, variables["params"])
    st = tx.init(variables["params"])

    def loss_fn(p, xb, tb):
        pred = model.apply({**variables, "params": p}, xb)
        return loss_handler(pred, tb, inp=xb)

    p = variables["params"]
    for k in range(3):
        g = jax.grad(loss_fn)(p, x, tar)
        upd, st = tx.update(g, st, p)
        pn = optax_apply(p, upd)
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(pn))
        )
        if k < 2:
            assert not changed, f"update leaked at micro-step {k}"
        else:
            assert changed, "no update flushed at the final micro-step"
        p = pn
