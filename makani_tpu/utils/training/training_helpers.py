"""Training debug/observability helpers (ref makani/utils/training/
training_helpers.py:33-230 and driver.py:686-699).

``dump_weights_and_grads`` — write the full parameter and gradient pytrees to
an .npz for offline inspection (the reference's dump_weights_and_grads).
``total_grad_norm`` — global L2 norm over a gradient pytree (the reference's
model-parallel-aware _compute_total_grad_norm: under pjit sharded leaves
reduce globally by construction).
``memory_usage`` — per-device memory stats where the backend exposes them.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["dump_weights_and_grads", "total_grad_norm", "memory_usage"]


def _flatten_named(tree, prefix):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)
        flat[f"{prefix}/{name}"] = np.asarray(leaf)
    return flat


def dump_weights_and_grads(path: str, model_params, grads=None, step: int = 0):
    """Save weights (and gradients) as ``weights_and_grads_step{N}.npz``."""
    os.makedirs(path, exist_ok=True)
    payload = _flatten_named(model_params, "weights")
    if grads is not None:
        payload.update(_flatten_named(grads, "grads"))
    out = os.path.join(path, f"weights_and_grads_step{step}.npz")
    np.savez(out, **payload)
    return out


def total_grad_norm(grads) -> jnp.ndarray:
    """Global L2 norm of a gradient pytree (jit-friendly)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))


def memory_usage() -> dict:
    """Per-device live-buffer bytes, where the backend reports them."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use") if k in stats}
        except Exception:
            out[str(d)] = {}
    return out
