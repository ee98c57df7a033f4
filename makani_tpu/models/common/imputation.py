"""NaN imputation (ref makani/models/common/imputation.py).

Datasets with masked regions (e.g. SST over land) carry NaNs; the imputer
replaces them with a fill value or a learned per-channel constant and can
return the mask as extra channels so the model sees where data was missing.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Imputer"]


class Imputer(nn.Module):
    num_chans: int
    mode: str = "constant"  # "constant" (fill value) or "learned"
    fill_value: float = 0.0
    append_mask: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mask = jnp.isnan(x)
        if self.mode == "learned":
            fill = self.param("fill", nn.initializers.zeros, (1, self.num_chans, 1, 1), jnp.float32)
            filled = jnp.where(mask, fill.astype(x.dtype), x)
        else:
            filled = jnp.where(mask, jnp.asarray(self.fill_value, x.dtype), x)
        if self.append_mask:
            return jnp.concatenate([filled, (~mask).astype(x.dtype)], axis=1)
        return filled
