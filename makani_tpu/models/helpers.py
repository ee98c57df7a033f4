"""Model helpers (ref makani/models/helpers.py:69).

``count_parameters`` — number of parameters, aware of mesh sharding: with
tensor/spectral-parallel shardings, per-device counts divide by the shard
factor exactly as the reference's reduction-aware local count.
"""

from __future__ import annotations

import numpy as np

import jax

__all__ = ["count_parameters"]


def count_parameters(params, local: bool = False) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        n = int(np.prod(leaf.shape))
        if local and hasattr(leaf, "sharding"):
            try:
                n = int(np.prod(leaf.sharding.shard_shape(leaf.shape)))
            except Exception:
                pass
        total += n
    return total
