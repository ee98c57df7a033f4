"""Position embeddings (ref makani/models/common/pos_embedding.py:25-140).

``LearnablePositionEmbedding`` — a learned additive embedding parameterized
by latitude ("lat"), by full position ("latlon"), or constant per channel
("const"); returned broadcastable to (1, C, H, W).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["LearnablePositionEmbedding"]


class LearnablePositionEmbedding(nn.Module):
    img_shape: Tuple[int, int] = (480, 960)
    num_chans: int = 1
    embed_type: str = "lat"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        H, W = self.img_shape
        init = nn.initializers.truncated_normal(stddev=0.02)
        if self.embed_type == "lat":
            emb = self.param("embedding", init, (1, self.num_chans, H, 1), jnp.float32)
            return jnp.broadcast_to(emb, (1, self.num_chans, H, W)).astype(self.dtype)
        if self.embed_type == "latlon":
            emb = self.param("embedding", init, (1, self.num_chans, H, W), jnp.float32)
            return emb.astype(self.dtype)
        if self.embed_type == "const":
            emb = self.param("embedding", init, (1, self.num_chans, 1, 1), jnp.float32)
            return jnp.broadcast_to(emb, (1, self.num_chans, H, W)).astype(self.dtype)
        raise ValueError(f"unknown embed_type {self.embed_type}")
