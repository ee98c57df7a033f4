"""Transform precision policy (ref makani/utils/precision.py amp-mode zoo):
policy selection/validation, IO-dtype coupling, table-casting rules, and
the accuracy ordering highest > default on a long accumulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.ops import precision as prec


@pytest.fixture(autouse=True)
def restore_policy():
    old = prec._current
    yield
    prec.set_transform_precision(old)


def test_policy_selection_and_validation():
    for name, val in [("highest", jax.lax.Precision.HIGHEST), ("high", jax.lax.Precision.HIGH), ("default", jax.lax.Precision.DEFAULT)]:
        prec.set_transform_precision(name.upper())  # case-insensitive
        assert prec.transform_precision() == val
    with pytest.raises(ValueError):
        prec.set_transform_precision("fp64")


def test_io_dtype_follows_policy():
    prec.set_transform_precision("default")
    assert prec.transform_io_dtype() == jnp.bfloat16
    for p in ("high", "highest"):
        prec.set_transform_precision(p)
        assert prec.transform_io_dtype() == jnp.float32


def test_maybe_cast_table():
    table = np.ones((4, 4), np.float32)
    out_bf = prec.maybe_cast_table(table, jnp.zeros((2,), jnp.bfloat16))
    assert out_bf.dtype == jnp.bfloat16
    out_f32 = prec.maybe_cast_table(table, jnp.zeros((2,), jnp.float32))
    assert out_f32.dtype == jnp.float32


def test_precision_accuracy_ordering():
    """HIGHEST must reproduce fp64 matmul results much closer than DEFAULT on
    an ill-conditioned long accumulation (the SHT Legendre regime)."""
    rng = np.random.default_rng(0)
    n = 512
    a = (rng.standard_normal((4, n)) * np.logspace(0, 3, n)).astype(np.float32)
    b = rng.standard_normal((n, 4)).astype(np.float32)
    exact = np.asarray(a, np.float64) @ np.asarray(b, np.float64)

    def err(p):
        prec.set_transform_precision(p)
        got = np.asarray(
            jnp.einsum("ik,kj->ij", jnp.asarray(a), jnp.asarray(b), precision=prec.transform_precision())
        )
        return np.abs(got - exact).max() / np.abs(exact).max()

    e_hi, e_def = err("highest"), err("default")
    assert e_hi <= e_def
    assert e_hi < 1e-5  # fp32-grade
