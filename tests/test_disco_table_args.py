"""psi tables as jit arguments (MAKANI_DISCO_TABLE_ARGS protocol).

By default DiscoConvS2 bakes every psi-derived table as an HLO constant.
`disco_table_context` instead serves them from a caller-passed pytree so
they become ordinary jit arguments — required at FCN3.1/0.25-degree table
sizes where the baked constants exceed the relay's compile-request limit.

The protocol under test (mirrors bench.py):
  1. jax.eval_shape the program once → registry fills with host tables;
  2. device_put the registry, pass it as an extra argument;
  3. trace/compile inside disco_table_context(tables).

Beyond value/grad parity with the baked path, the tests prove the argument
is actually CONSUMED: perturbing a passed table must change the output
(otherwise the context silently fell back to baked constants and the 413
fix would be a no-op).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.ops import disco as disco_mod
from makani_tpu.ops.disco import DiscoConvS2, disco_table_context, disco_table_registry


def _registered_tables(fn, *args):
    """Run the registry-filling abstract trace; return this program's tables."""
    before = set(disco_table_registry())
    jax.eval_shape(fn, *args)
    reg = disco_table_registry()
    # keys are deterministic per conv config — reuse pre-existing entries too
    return {k: jnp.asarray(v) for k, v in reg.items()}


@pytest.mark.parametrize("variant", ["window", "dense", "taps"])
def test_table_args_match_baked(variant, monkeypatch):
    monkeypatch.setenv("MAKANI_DISCO_FUSED", variant)
    conv = DiscoConvS2((17, 36), (12, 24), (3, 3), basis_type="morlet th", basis_norm_mode="mean")
    g, og, ig = 2, 3, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, g * ig, 17, 36).astype(np.float32))
    w = jnp.asarray(rng.randn(g, og, ig, conv.K).astype(np.float32) * 0.2)

    def f(x_, w_):
        return conv.fused(x_, w_)

    baked = np.asarray(f(x, w))
    tabs = _registered_tables(f, x, w)
    mine = {k: v for k, v in tabs.items() if k.startswith(f"disco|{conv._tab_base}|")}
    assert mine, "fused path registered no tables"

    @jax.jit
    def f_args(x_, w_, tabs_):
        with disco_table_context(tabs_):
            return f(x_, w_)

    got = np.asarray(f_args(x, w, tabs))
    np.testing.assert_allclose(got, baked, atol=1e-5 * np.abs(baked).max(), rtol=1e-5)

    # grads agree through the argument path
    g_b = jax.grad(lambda ww: jnp.sum(jnp.sin(f(x, ww))))(w)
    g_a = jax.grad(lambda ww: jnp.sum(jnp.sin(f_args(x, ww, tabs))))(w)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b), atol=1e-4 * float(jnp.abs(g_b).max()))

    # the argument is consumed: zeroing this conv's tables must change output
    dead = {k: (jnp.zeros_like(v) if k in mine else v) for k, v in tabs.items()}
    got_dead = np.asarray(f_args(x, w, dead))
    assert not np.allclose(got_dead, baked), "context tables were ignored (baked fallback)"


def test_table_args_call_path(monkeypatch):
    """The two-stage __call__ (encoder responses) path also honors the context."""
    monkeypatch.setenv("MAKANI_DISCO_FUSED", "window")
    conv = DiscoConvS2((16, 32), (16, 32), (2, 2), basis_norm_mode="mean")
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 3, 16, 32).astype(np.float32))

    baked = np.asarray(conv(x))
    tabs = _registered_tables(conv, x)

    @jax.jit
    def f_args(x_, tabs_):
        with disco_table_context(tabs_):
            return conv(x_)

    got = np.asarray(f_args(x, tabs))
    np.testing.assert_allclose(got, baked, atol=1e-5 * np.abs(baked).max(), rtol=1e-5)


def test_missing_key_falls_back_to_baked(monkeypatch):
    """A context lacking this conv's keys must transparently bake constants."""
    monkeypatch.setenv("MAKANI_DISCO_FUSED", "dense")
    conv = DiscoConvS2((16, 32), (16, 32), (2, 2), basis_norm_mode="mean")
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 2, 16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 2, 2, conv.K).astype(np.float32))
    baked = np.asarray(conv.fused(x, w))
    with disco_table_context({}):
        got = np.asarray(jax.jit(lambda a, b: conv.fused(a, b))(x, w))
    np.testing.assert_allclose(got, baked, atol=1e-5 * np.abs(baked).max(), rtol=1e-5)


def test_context_restores_previous_state():
    assert getattr(disco_mod._TABLE_CTX, "tables", None) is None
    with disco_table_context({"a": 1}):
        with disco_table_context({"b": 2}):
            assert disco_mod._TABLE_CTX.tables == {"b": 2}
        assert disco_mod._TABLE_CTX.tables == {"a": 1}
    assert disco_mod._TABLE_CTX.tables is None
