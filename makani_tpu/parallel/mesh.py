"""Device-mesh bookkeeping: the TPU-native communicator layer.

Replaces the reference's NCCL process-group tree (``makani/utils/comm.py:
114-201``) with a single named `jax.sharding.Mesh`. The reference builds an
orthogonal communicator hierarchy

    world -> model -> spatial -> h, w
                   -> matmul
          -> data  -> ensemble, batch

and addresses groups by string name. Here the same five leaf names become mesh
axes ``("batch", "ensemble", "h", "w", "matmul")``; the composite names
("spatial", "model", "data", "world") resolve to tuples of leaf axes, which is
what `PartitionSpec` consumes directly. Collectives are never issued by hand
against a group: `pjit` inserts them from sharding constraints, and the few
manual patterns (distributed spectral transforms, ensemble transposes) use
`shard_map` over these axis names.

Unlike NCCL there is no process bootstrap: under SPMD one Python process
drives all devices, so ``init`` simply constructs and registers the mesh.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = [
    "LEAF_AXES",
    "COMPOSITE_AXES",
    "init",
    "get_mesh",
    "axis_size",
    "is_distributed",
    "mesh_axes",
    "model_axes",
    "cleanup",
]

# leaf axis order: batch-like axes first (outermost, may span DCN), then the
# model axes (innermost, must ride ICI). This ordering places the h/w/matmul
# collectives on adjacent devices.
LEAF_AXES = ("batch", "ensemble", "h", "w", "matmul")

COMPOSITE_AXES = {
    "spatial": ("h", "w"),
    "model": ("h", "w", "matmul"),
    "data": ("batch", "ensemble"),
    "world": LEAF_AXES,
}

_MESH: Mesh | None = None


def init(
    h: int = 1,
    w: int = 1,
    matmul: int = 1,
    ensemble: int = 1,
    batch: int | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build and register the global mesh.

    ``batch`` defaults to the remaining device count, mirroring the
    reference's auto-sized data-parallel group (comm.py:156-178).
    """
    global _MESH
    devices = list(devices if devices is not None else jax.devices())
    ndev = len(devices)
    model_size = h * w * matmul * ensemble
    if batch is None:
        if ndev % model_size != 0:
            raise ValueError(f"device count {ndev} not divisible by model size {model_size}")
        batch = ndev // model_size
    total = batch * model_size
    if total != ndev:
        raise ValueError(f"mesh size {total} != device count {ndev}")

    dev_array = np.asarray(devices).reshape(batch, ensemble, h, w, matmul)
    _MESH = Mesh(dev_array, LEAF_AXES)
    return _MESH


def get_mesh() -> Mesh:
    """The active mesh; lazily creates a trivial all-batch mesh."""
    global _MESH
    if _MESH is None:
        _MESH = init()
    return _MESH


def cleanup() -> None:
    global _MESH
    _MESH = None


def _leaves(name: str):
    if name in COMPOSITE_AXES:
        return COMPOSITE_AXES[name]
    if name in LEAF_AXES:
        return (name,)
    raise ValueError(f"Unknown mesh axis {name}")


def axis_size(name: str) -> int:
    mesh = get_mesh()
    return math.prod(mesh.shape[a] for a in _leaves(name))


def is_distributed(name: str) -> bool:
    return axis_size(name) > 1


def mesh_axes(name: str):
    """Leaf axis tuple for a (possibly composite) name, for PartitionSpec use."""
    return _leaves(name)


def model_axes():
    """Leaf axes belonging to the model group, in order."""
    return COMPOSITE_AXES["model"]
