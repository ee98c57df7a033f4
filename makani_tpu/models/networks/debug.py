"""Trivial passthrough network for harness tests
(ref makani/models/networks/debug.py:20-59)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["DebugNet"]


class DebugNet(nn.Module):
    inp_shape: Tuple[int, int] = (721, 1440)
    out_shape: Tuple[int, int] = (721, 1440)
    inp_chans: int = 2
    out_chans: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # learnable scalar keeps the optimizer/test harness honest
        scale = self.param("scale", nn.initializers.ones, (1,), jnp.float32)
        if x.shape[1] >= self.out_chans:
            y = x[:, : self.out_chans]
        else:
            y = jnp.pad(x, [(0, 0), (0, self.out_chans - x.shape[1]), (0, 0), (0, 0)])
        return y * scale.astype(x.dtype)
