"""Output parametrizations wrapper (ref makani/models/parametrizations.py:
26-328).

``ConstraintsWrapper`` applies a configured list of physics constraints to a
model's normalized output (nonnegativity of water channels, hydrostatic
balance projection of the (z, t) stack). Configured as in the reference:

    constraints:
      - type: "nonnegative"
        channels: ["q500", ...]      # default: all water channels
        parameters: {...}
      - type: "hydrostatic_balance"
        parameters: {p_min: 50, p_max: 900}
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.utils.constraints import HydrostaticBalanceProjection, NonNegativeConstraint
from makani_tpu.utils.features import get_water_channels

__all__ = ["ConstraintsWrapper", "build_constraints"]


def build_constraints(constraints_cfg, channel_names, bias=None, scale=None):
    """Instantiate the configured constraint callables."""
    out = []
    for cfg in constraints_cfg or []:
        kind = cfg.get("type")
        kwargs = cfg.get("parameters", {}) or {}
        if kind in ("nonnegative", "nonnegativity"):
            names = cfg.get("channels")
            if names is None:
                names = [channel_names[i] for i in get_water_channels(list(channel_names))]
            out.append(NonNegativeConstraint(list(channel_names), names, bias=bias, scale=scale, **kwargs))
        elif kind in ("hydrostatic_balance", "hydrostatic balance"):
            out.append(HydrostaticBalanceProjection(list(channel_names), bias=bias, scale=scale, **kwargs))
        else:
            raise NotImplementedError(f"constraint type {kind}")
    return out


class ConstraintsWrapper(nn.Module):
    """Apply constraints to the wrapped model's output
    (ref parametrizations.py:234-328)."""

    model: nn.Module
    constraints: Sequence[Any] = ()

    @nn.compact
    def __call__(self, x, *args, deterministic: bool = True, **kwargs):
        y = self.model(x, *args, deterministic=deterministic, **kwargs)
        for c in self.constraints:
            y = c(y, train=not deterministic)
        return y
