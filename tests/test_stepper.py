"""MultiStepWrapper rollout semantics (ref makani tests: test_stepper.py).

Pins: multi-step training output equals the manual repeated single-step
rollout with the history window slid; eval returns the first step only;
push_forward cuts gradients between steps (lax.stop_gradient, ref
stepper.py:256-257's pushforward mode); use_scan and multistep_checkpoint
are pure scheduling choices (value + grad parity with the unrolled form).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.preprocessor import Preprocessor2D
from makani_tpu.models.stepper import MultiStepWrapper, SingleStepWrapper
from makani_tpu.utils.yparams import ParamsBase

B, C, H, W = 2, 3, 8, 16


class TinyNet(nn.Module):
    """1x1 conv over the flattened input channels -> C outputs; nonlinear so
    gradient structure is informative."""

    out_chans: int = C

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.param("kernel", nn.initializers.normal(0.3), (x.shape[1], self.out_chans))
        y = jnp.einsum("bchw,co->bohw", x, k)
        return jnp.tanh(y)


def make_pair(n_history=0, n_future=2, add_zenith=False, **kw):
    params = ParamsBase(
        dict(
            img_shape_x=H,
            img_shape_y=W,
            n_history=n_history,
            channel_names=["a", "b", "c"],
            model_grid_type="equiangular",
            add_zenith=add_zenith,
        )
    )
    pre = Preprocessor2D(params)
    net = TinyNet()
    multi = MultiStepWrapper(model=net, preprocessor=pre, n_future=n_future, **kw)
    single = SingleStepWrapper(model=net, preprocessor=pre)
    return multi, single, pre


def _data(n_history=0, n_future=2, zen_chans=0, seed=0):
    rng = np.random.RandomState(seed)
    T = n_history + 1
    inp = jnp.asarray(rng.randn(B, T * C, H, W).astype(np.float32))
    unp = (
        jnp.asarray(rng.randn(B, T + n_future, zen_chans, H, W).astype(np.float32))
        if zen_chans
        else None
    )
    return inp, unp


def test_multistep_equals_manual_rollout():
    multi, single, pre = make_pair(n_history=1, n_future=2)
    inp, _ = _data(n_history=1)
    p = multi.init(jax.random.PRNGKey(0), inp)

    out = multi.apply(p, inp, train=True)
    assert out.shape == (B, 3 * C, H, W)

    # manual: repeated single-step with the window slid between steps
    ps = {"params": {"model": p["params"]["model"]}}
    cur = inp
    expect = []
    for s in range(3):
        pred = single.apply(ps, cur)
        expect.append(pred)
        cur = pre.append_history(cur, pred, s)
    expect = jnp.concatenate(expect, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)


def test_eval_returns_first_step_only():
    multi, single, _ = make_pair(n_future=2)
    inp, _ = _data()
    p = multi.init(jax.random.PRNGKey(0), inp)
    out = multi.apply(p, inp, train=False)
    assert out.shape == (B, C, H, W)
    ps = {"params": {"model": p["params"]["model"]}}
    np.testing.assert_allclose(np.asarray(out), np.asarray(single.apply(ps, inp)), atol=1e-6)


def test_unpredicted_windows_match_manual():
    """Each rollout step must see its own time window of the unpredicted
    (zenith-like) sequence."""
    multi, single, pre = make_pair(n_history=0, n_future=1, add_zenith=True)
    inp, unp = _data(n_future=1, zen_chans=1)
    p = multi.init(jax.random.PRNGKey(0), inp, unp)
    out = multi.apply(p, inp, unp, train=True)

    ps = {"params": {"model": p["params"]["model"]}}
    s0 = single.apply(ps, inp, unp[:, 0:1])
    cur = pre.append_history(inp, s0, 0)
    s1 = single.apply(ps, cur, unp[:, 1:2])
    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp.concatenate([s0, s1], 1)), atol=1e-6)


def test_push_forward_stops_gradient_to_input():
    """With push_forward, later steps are cut from the input: d(step>0 loss)/
    d(inp) must be exactly zero; without it, nonzero."""
    inp, _ = _data()

    def grad_to_input(push):
        multi, _, _ = make_pair(n_future=1, push_forward=push)
        p = multi.init(jax.random.PRNGKey(0), inp)

        def loss(x):
            out = multi.apply(p, x, train=True)
            return jnp.sum(out[:, C:] ** 2)  # second step only

        return np.asarray(jax.grad(loss)(inp))

    g_pf = grad_to_input(True)
    g_no = grad_to_input(False)
    assert np.all(g_pf == 0.0)
    assert np.abs(g_no).max() > 0.0


@pytest.mark.parametrize("kw", [dict(use_scan=True), dict(multistep_checkpoint=True)])
def test_scan_and_checkpoint_value_grad_parity(kw):
    inp, unp = _data(n_future=2, zen_chans=1)
    base, _, _ = make_pair(n_future=2, add_zenith=True)
    variant, _, _ = make_pair(n_future=2, add_zenith=True, **kw)
    p = base.init(jax.random.PRNGKey(0), inp, unp)

    y0 = base.apply(p, inp, unp, train=True)
    y1 = variant.apply(p, inp, unp, train=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

    g0 = jax.grad(lambda q: jnp.sum(base.apply(q, inp, unp, train=True) ** 2))(p)
    g1 = jax.grad(lambda q: jnp.sum(variant.apply(q, inp, unp, train=True) ** 2))(p)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        # scan reassociates the accumulation; only scheduling may differ
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4)
