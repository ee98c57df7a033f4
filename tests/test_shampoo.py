"""Shampoo (SIRFShampoo config role): preconditioner math + convergence.

Pins (a) the state layout (per-axis Kronecker factors, oversized axes
skipped), (b) that the inverse-root preconditioner whitens an ill-conditioned
quadratic faster than SGD-momentum at matched step norm, (c) periodic root
refresh under jit, (d) the SIRFShampoo config path builds and trains.
Covers ref makani/utils/driver.py:702-754 (SIRFShampoo optimizer option).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from makani_tpu.utils.training.optimizer import get_optimizer, scale_by_shampoo
from makani_tpu.utils.training.optimizer import _inv_pth_root, _precond_axes


def test_precond_axes_and_state_shapes():
    tx = scale_by_shampoo(max_precond_dim=64)
    p = {
        "mat": jnp.zeros((32, 48)),
        "stack": jnp.zeros((16, 16, 8, 2)),
        "big": jnp.zeros((128, 32)),  # first axis above cap -> skipped
        "bias": jnp.zeros((5,)),
        "scalar": jnp.zeros(()),
    }
    st = tx.init(p)
    assert tuple(s.shape for s in st.stats["mat"]) == ((32, 32), (48, 48))
    assert tuple(s.shape for s in st.stats["stack"]) == ((16, 16), (16, 16), (8, 8), (2, 2))
    assert tuple(s.shape for s in st.stats["big"]) == ((32, 32),)
    assert tuple(s.shape for s in st.stats["bias"]) == ((5, 5),)
    assert st.stats["scalar"] == ()


def test_inv_pth_root():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((12, 12)).astype(np.float32)
    s = jnp.asarray(a @ a.T + 0.1 * np.eye(12, dtype=np.float32))
    r = _inv_pth_root(s, 2, ridge=0.0)
    # r = s^(-1/2): r s r ~= I
    np.testing.assert_allclose(np.asarray(r @ s @ r), np.eye(12), atol=1e-3)


def test_whitens_ill_conditioned_quadratic():
    """min 0.5 x^T H x with cond(H) ~ 1e3: Shampoo's full-matrix left
    preconditioner should beat momentum-SGD at the same grafted step norm."""
    d = 24
    evals = jnp.logspace(0, 3, d)
    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(0), (d, d)))
    h = (q * evals) @ q.T

    def loss(x):
        return 0.5 * x["w"] @ h @ x["w"]

    def run(tx, steps=250, lr=1e-4):
        x = {"w": jnp.ones((d,)) / jnp.sqrt(d)}
        st = tx.init(x)

        @jax.jit
        def step(x, st):
            g = jax.grad(loss)(x)
            u, st = tx.update(g, st, x)
            x = jax.tree.map(lambda p, du: p - lr * du, x, u)
            return x, st

        for _ in range(steps):
            x, st = step(x, st)
        return float(loss(x))

    shampoo = run(scale_by_shampoo(b1=0.9, precondition_interval=5))
    sgdm = run(optax.trace(decay=0.9))
    assert shampoo < sgdm * 0.5, (shampoo, sgdm)


def test_root_refresh_interval_under_jit():
    tx = scale_by_shampoo(precondition_interval=3)
    p = {"w": jnp.zeros((8, 8))}
    g = {"w": jnp.eye(8) * jnp.arange(1.0, 9.0)}
    st = tx.init(p)
    update = jax.jit(lambda g, s: tx.update(g, s, None))
    _, st1 = update(g, st)  # count=1 -> refresh
    r1 = np.asarray(st1.roots["w"][0])
    assert not np.allclose(r1, np.eye(8))  # refreshed away from identity
    _, st2 = update(g, st1)  # count=2 -> cached
    np.testing.assert_array_equal(np.asarray(st2.roots["w"][0]), r1)
    _, st3 = update(g, st2)  # count=3 -> cached
    np.testing.assert_array_equal(np.asarray(st3.roots["w"][0]), r1)
    _, st4 = update(g, st3)  # count=4 -> refresh (stats moved)
    assert not np.allclose(np.asarray(st4.roots["w"][0]), r1)


@pytest.mark.parametrize("name", ["SIRFShampoo", "Shampoo"])
def test_config_path_builds_and_trains(name):
    from makani_tpu.utils.yparams import ParamsBase

    params = ParamsBase({"optimizer_type": name, "lr": 1e-3, "weight_decay": 0.01,
                         "optimizer_precondition_interval": 2})
    model_params = {"params": {"dense": {"kernel": jnp.ones((6, 4)), "bias": jnp.zeros((4,))}}}
    tx, _sched = get_optimizer(params, model_params)
    st = tx.init(model_params)
    g = jax.tree.map(jnp.ones_like, model_params)
    u, st = tx.update(g, st, model_params)
    u2, _ = tx.update(g, st, model_params)
    for leaf in jax.tree.leaves(u):
        assert np.all(np.isfinite(np.asarray(leaf)))
