"""Factored-second-moment Adam + bf16 weight-mirror training path.

The factored nu (Adafactor estimator inside Adam's update rule) is the
round-3 optimizer byte cut for the (embed, embed, L) dhconv stacks; these
tests pin (a) exactness on rank-1 g^2 structure, (b) state compression,
(c) convergence parity with full Adam, and (d) the bf16 mirror loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from makani_tpu.utils.training.optimizer import (
    cast_params,
    get_optimizer,
    scale_by_adam_factored,
)


def test_factored_matches_adam_on_rank1_gsq():
    """On gradients whose g^2 is exactly rank-1, the factored estimator is
    exact, so updates must match optax.scale_by_adam to fp32 tolerance."""
    r = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (200,))) + 0.5
    c = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (300,))) + 0.5
    g = jnp.sqrt(r[:, None] * c[None, :])
    p = {"w": jnp.zeros((200, 300)), "b": jnp.zeros((7,))}
    gs = {"w": g, "b": jnp.ones((7,)) * 0.3}

    tx_f, tx_a = scale_by_adam_factored(), optax.scale_by_adam()
    sf, sa = tx_f.init(p), tx_a.init(p)
    for _ in range(5):
        uf, sf = tx_f.update(gs, sf, p)
        ua, sa = tx_a.update(gs, sa, p)
    assert float(jnp.abs(uf["w"] - ua["w"]).max()) < 1e-5
    # small leaves keep the exact full nu
    assert float(jnp.abs(uf["b"] - ua["b"]).max()) == 0.0


def test_factored_state_is_compressed():
    p = {"dhconv": jnp.zeros((384, 384, 121)), "bias": jnp.zeros((384,))}
    tx = scale_by_adam_factored(mu_dtype=jnp.bfloat16)
    s = tx.init(p)
    nu = s.nu["dhconv"]
    assert nu.v.size == 0  # no full second moment
    assert nu.v_row.shape == (384, 121) and nu.v_col.shape == (384, 121)
    assert s.nu["bias"].v.shape == (384,)  # unfactored small leaf
    assert s.mu["dhconv"].dtype == jnp.bfloat16
    # update runs and produces finite, param-shaped output
    g = {"dhconv": jnp.ones((384, 384, 121)) * 0.01, "bias": jnp.ones((384,))}
    u, s = tx.update(g, s, p)
    assert u["dhconv"].shape == p["dhconv"].shape
    assert np.isfinite(np.asarray(u["dhconv"]).sum())


def test_factored_converges_like_adam():
    """Noisy least squares: factored-nu Adam must reach a loss within 20% of
    full Adam's after the same number of steps."""
    key = jax.random.PRNGKey(42)
    A = jax.random.normal(key, (64, 32))
    w_true = jax.random.normal(jax.random.PRNGKey(7), (32, 16))
    y = A @ w_true

    def loss_fn(w):
        return jnp.mean((A @ w - y) ** 2)

    def run(tx):
        w = jnp.zeros((32, 16))
        s = tx.init(w)
        for _ in range(60):
            g = jax.grad(loss_fn)(w)
            u, s = tx.update(g, s, w)
            w = optax.apply_updates(w, u)
        return float(loss_fn(w))

    lf = run(optax.chain(scale_by_adam_factored(min_dim_size_to_factor=8), optax.scale(-0.05)))
    la = run(optax.chain(optax.scale_by_adam(), optax.scale(-0.05)))
    assert lf < max(1.2 * la, la + 1e-3)


def test_get_optimizer_factored_flag():
    from makani_tpu.utils.yparams import ParamsBase

    params = ParamsBase(dict(lr=1e-3, optimizer_type="Adam", scheduler="none", optimizer_nu_factored=True, optimizer_mu_dtype="bfloat16"))
    mp = {"w": jnp.zeros((256, 256)), "b": jnp.zeros((5,))}
    tx, _ = get_optimizer(params, mp)
    s = tx.init(mp)
    g = {"w": jnp.ones((256, 256)), "b": jnp.ones((5,))}
    u, s = tx.update(g, s, mp)
    # factored state present inside the chain
    leaves = jax.tree.leaves(s)
    assert any(l.size == 0 for l in leaves)  # the empty full-nu placeholder
    assert np.isfinite(float(jnp.abs(u["w"]).max()))


def test_bf16_mirror_training_loop():
    """The mirror loop (bf16 params in the forward, fp32 master in the
    optimizer) converges on a small problem and keeps the master fp32."""
    A = jax.random.normal(jax.random.PRNGKey(3), (64, 32))
    y = A @ jax.random.normal(jax.random.PRNGKey(4), (32, 8))

    def loss_fn(w):
        return jnp.mean((A.astype(w.dtype) @ w - y.astype(w.dtype)).astype(jnp.float32) ** 2)

    tx = optax.adam(1e-1)
    master = jnp.zeros((32, 8), jnp.float32)
    s = tx.init(master)
    pc = cast_params(master, jnp.bfloat16)
    l0 = float(loss_fn(pc))
    for _ in range(50):
        g = jax.grad(loss_fn)(pc)
        assert g.dtype == jnp.bfloat16
        u, s = tx.update(g.astype(jnp.float32), s, master)
        master = optax.apply_updates(master, u)
        pc = cast_params(master, jnp.bfloat16)
    assert master.dtype == jnp.float32 and pc.dtype == jnp.bfloat16
    assert float(loss_fn(pc)) < 0.05 * l0
