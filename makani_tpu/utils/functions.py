"""Small shared functions (ref makani/utils/functions.py:29-43)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["expand_ensemble", "fold_ensemble"]


def expand_ensemble(x, E: int):
    """(B, ...) -> (B*E, ...) by repetition."""
    return jnp.repeat(x, E, axis=0)


def fold_ensemble(x, E: int):
    """(B*E, ...) -> (B, E, ...)."""
    return x.reshape(x.shape[0] // E, E, *x.shape[1:])
