"""Pangu-Weather official-release ONNX import (ref pangu_onnx.py:22-147).

Runs the published Pangu-Weather ONNX graphs
(https://github.com/198808xc/Pangu-Weather) inside the TPU framework: the
graph is parsed natively (``models/onnx_proto.py``), executed as jitted JAX
(``models/onnx_wrapper.py``), and its initializers live in the flax param
tree — unlike the reference, which hands the graph to an onnxruntime
CPU/CUDA session outside the training framework
(ref makani/models/onnx_wrapper.py:84-120).

The wrapper's job is the channel-layout adaptation the reference performs in
``prepare_input``/``prepare_output`` (ref pangu_onnx.py:70-123): makani
keeps one flat channel stack, while the exported Pangu graph takes surface
and atmospheric variables as two inputs, the atmospheric ones laid out
(n_atmo_vars, n_pressure_levels, Lat, Lon).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.onnx_wrapper import OnnxModule
from makani_tpu.utils.features import get_channel_groups

__all__ = ["PanguOnnx"]


class PanguOnnx(nn.Module):
    """ONNX-released Pangu as a flax module over the flat channel stack.

    Args:
        inp_shape: (lat, lon) grid shape.
        channel_names: flat channel-name list (drives the atmo/surface split,
            ref pangu_onnx.py:44-68).
        aux_channel_names: auxiliary channel names appended to the stack.
        onnx_file: path to the released ``.onnx`` graph.
        input_names: graph input names (atmo, surface) — the official
            release uses ``("input", "input_surface")``.
        output_names: optional subset/order of graph outputs (atmo, surface);
            by default the graph's declared order ``(output,
            output_surface)`` is assumed.
    """

    inp_shape: Tuple[int, int] = (721, 1440)
    channel_names: Sequence[str] = ()
    aux_channel_names: Sequence[str] = ()
    onnx_file: str = ""
    input_names: Tuple[str, str] = ("input", "input_surface")
    output_names: Tuple[str, str] = ("output", "output_surface")

    def setup(self):
        atmo, surf, _dyn, _stat, plvls = get_channel_groups(list(self.channel_names), list(self.aux_channel_names))
        self.n_atmo_groups = len(list(plvls))
        if self.n_atmo_groups and len(atmo) % self.n_atmo_groups:
            raise ValueError(
                f"expected atmospheric channels divisible by pressure groups, got {len(atmo)} / {self.n_atmo_groups}"
            )
        self.n_atmo_chans = len(atmo) // self.n_atmo_groups if self.n_atmo_groups else 0
        self.atmo_channels = np.asarray(atmo, dtype=np.int64)
        self.surf_channels = np.asarray(surf, dtype=np.int64)
        self.core = OnnxModule(onnx_file=self.onnx_file)

    def prepare_input(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(1, V, Lat, Lon) -> surface (n_surf, Lat, Lon) and atmo
        (n_atmo_chans, n_groups, Lat, Lon) — ref pangu_onnx.py:70-110."""
        if x.shape[0] != 1:
            raise NotImplementedError("the exported Pangu graph has a fixed batch of 1")
        x = x[0]
        lat, lon = x.shape[-2:]
        surface = x[self.surf_channels]
        atmo = x[self.atmo_channels].reshape(self.n_atmo_groups, self.n_atmo_chans, lat, lon)
        atmo = jnp.swapaxes(atmo, 0, 1)
        return surface, atmo

    def prepare_output(self, out_surface: jnp.ndarray, out_atmo: jnp.ndarray) -> jnp.ndarray:
        """Invert prepare_input's regrouping back into the flat stack
        (ref pangu_onnx.py:112-123). The flat order is surface channels
        first, then atmo flattened (groups, vars) — matching the reference's
        ``cat([surface, atmo.reshape(-1, ...)], 0)`` convention."""
        lat, lon = out_surface.shape[-2:]
        flat_atmo = jnp.swapaxes(out_atmo, 0, 1).reshape(-1, lat, lon)
        n_out = len(self.surf_channels) + len(self.atmo_channels)
        # scatter back into makani channel order (the reference leaves the
        # stack permuted as [surf, atmo]; we undo it so the wrapper composes
        # with makani-style losses/metrics over the original channel layout)
        order = np.concatenate([self.surf_channels, self.atmo_channels])
        inv = np.empty(n_out, dtype=np.int64)
        inv[order] = np.arange(n_out)
        out = jnp.concatenate([out_surface, flat_atmo], axis=0)[inv]
        return out[None]

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        surface, atmo = self.prepare_input(x)
        outs = self.core({self.input_names[0]: atmo, self.input_names[1]: surface})
        from makani_tpu.models.onnx_wrapper import _get_executor

        names = _get_executor(self.onnx_file).output_names
        by_name = dict(zip(names, outs))
        out_atmo = by_name.get(self.output_names[0], outs[0])
        out_surface = by_name.get(self.output_names[1], outs[-1])
        return self.prepare_output(out_surface, out_atmo)
