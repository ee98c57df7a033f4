"""NaN imputation (ref makani/models/common/imputation.py).

Datasets with masked regions (e.g. SST over land) carry NaNs; the imputer
replaces them with a fill value or a learned per-channel constant and can
return the mask as extra channels so the model sees where data was missing.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Imputer", "MLPImputation"]


class MLPImputation(nn.Module):
    """Learned imputation of masked channels from all input channels
    (ref makani/models/common/imputation.py MLPImputation).

    Fields like SST are NaN over land; a small pointwise MLP conditioned on
    every input channel predicts fill values for the ``impute_chans`` subset.
    Only masked (NaN, or explicitly masked) positions are replaced.
    """

    inp_chans: int
    impute_chans: tuple  # channel indices to impute
    mlp_ratio: float = 2.0
    act_layer: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        import numpy as np

        import jax
        from makani_tpu.models.common.layers import EncoderDecoder

        idx = np.asarray(self.impute_chans)
        sub = x[:, idx]
        missing = jnp.isnan(sub)
        if mask is not None:
            missing = missing | (mask.astype(bool) if mask.ndim == sub.ndim else mask[:, None].astype(bool))

        # the MLP must not see NaNs anywhere
        x_clean = jnp.where(jnp.isnan(x), 0.0, x)
        vals = EncoderDecoder(
            num_layers=1,
            output_dim=len(idx),
            hidden_dim=int(self.mlp_ratio * len(idx)),
            act_layer=self.act_layer or jax.nn.gelu,
            dtype=self.dtype,
            name="mlp",
        )(x_clean)
        filled = jnp.where(missing, vals.astype(x.dtype), jnp.where(jnp.isnan(sub), 0.0, sub))
        return x_clean.at[:, idx].set(filled)


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
