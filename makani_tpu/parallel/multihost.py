"""Multi-host (multi-process) SPMD support.

The reference runs one process per GPU under ``mpirun``/``srun`` and builds an
NCCL communicator tree (``makani/utils/comm.py:114-201``; README.md:56-58
documents 256-GPU recipes). The TPU-native equivalent is JAX multi-controller
SPMD: every host runs the same program, ``jax.distributed.initialize`` wires
the processes into one runtime, and a single global ``Mesh`` spans all hosts'
devices. Model code is unchanged — pjit/GSPMD handles cross-host collectives
over ICI/DCN exactly as it does single-host.

What genuinely changes under multi-host, and what this module provides:

  * **bootstrap** — ``init_multihost()``: calls ``jax.distributed.initialize``
    (env/TPU-pod auto-detection, or explicit coordinator/rank arguments for
    CPU/GPU clusters), before any backend touch.
  * **host-local data** — each process loads only the global-batch slice its
    own devices consume. ``local_batch_slice(mesh)`` computes that slice from
    the process's coordinates along the mesh's (batch, ensemble) axes, and
    ``make_global_array(x_local, mesh, spec)`` assembles the global
    ``jax.Array`` from per-process shards
    (``jax.make_array_from_process_local_data``).
  * **rank-aware side effects** — ``is_main_process()`` gates logging,
    metric writes and experiment artifacts; orbax checkpointing is already
    multi-process-aware.
  * **replicated host readback** — ``fetch_replicated(x)``: device_get of a
    value that is replicated (or made addressable) on every process, for loss
    scalars and metric curves.

There is still exactly one program; no rank-dependent control flow may touch
traced code.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

__all__ = [
    "init_multihost",
    "is_initialized",
    "process_index",
    "process_count",
    "is_main_process",
    "local_batch_slice",
    "make_global_array",
    "fetch_replicated",
    "sync_processes",
]

_INITIALIZED = False


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, relies on JAX's auto-detection (TPU pod metadata, SLURM,
    OMPI environment variables). Explicit arguments support manual wire-up —
    e.g. CPU multi-process tests. Must run before the first backend use.
    No-op when neither arguments nor a recognizable environment are present
    (plain single-process runs).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    if coordinator_address is None and num_processes is None:
        import os

        auto_env = any(
            k in os.environ
            for k in (
                "COORDINATOR_ADDRESS",
                "SLURM_JOB_ID",
                "OMPI_COMM_WORLD_SIZE",
                "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS",
            )
        )
        if not auto_env:
            return
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError) as e:
            # an env var looked multi-host but no coordinator is derivable
            # (e.g. single-host TPU images that set TPU_WORKER_HOSTNAMES);
            # stay single-process rather than crash
            logger.warning(f"multihost auto-detection failed ({e}); running single-process")
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    _INITIALIZED = True
    logger.info(f"multihost: process {jax.process_index()}/{jax.process_count()} with {jax.local_device_count()} local devices")


def is_initialized() -> bool:
    return _INITIALIZED


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def _axis_index(mesh: Mesh, name: str) -> int:
    return mesh.axis_names.index(name)


def local_batch_slice(mesh: Mesh, batch_size_global: int, axes=("batch", "ensemble")) -> slice:
    """The slice of the global (batch*ensemble-folded) sample dim owned by this
    process's devices, for data sharded ``P(axes, ...)``.

    Mirrors the reference's DistributedSampler split over the "data" group
    (``makani/utils/dataloader.py``): each host reads only its own samples.
    Requires this process's devices to be contiguous along the folded data
    axes (true for standard TPU process-to-mesh layouts); asserts otherwise.
    """
    axis_sizes = [mesh.shape[a] for a in axes]
    n_shards = int(np.prod(axis_sizes))
    if batch_size_global % n_shards != 0:
        raise ValueError(f"global batch {batch_size_global} not divisible by data shards {n_shards}")

    # coordinates of this process's devices along the folded data axes
    dev_array = mesh.devices  # ndarray of Devices, shape = mesh.shape
    pidx = jax.process_index()
    axis_ids = [_axis_index(mesh, a) for a in axes]
    coords = np.argwhere(np.vectorize(lambda d: d.process_index)(dev_array) == pidx)
    if coords.size == 0:
        raise ValueError("this process owns no devices in the mesh")
    # folded (row-major over the requested axes) data-shard ids this process touches
    folded = np.zeros(len(coords), dtype=np.int64)
    for a_i, ax in enumerate(axis_ids):
        folded = folded * axis_sizes[a_i] + coords[:, ax]
    lo, hi = int(folded.min()), int(folded.max())
    uniq = np.unique(folded)
    if not np.array_equal(uniq, np.arange(lo, hi + 1)):
        raise ValueError("process devices are not contiguous along the data axes; use make_global_array directly")
    per = batch_size_global // n_shards
    return slice(lo * per, (hi + 1) * per)


def make_global_array(x_local: np.ndarray, mesh: Mesh, spec: P, global_shape=None) -> jax.Array:
    """Assemble a global jax.Array from this process's local shard.

    ``x_local`` holds only the rows selected by :func:`local_batch_slice`
    (and, if spatially sharded IO is active, only the local (h, w) tile).
    ``global_shape`` should be passed explicitly when any dimension is sharded
    unevenly (721 latitudes). Single-process meshes fall back to device_put.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x_local, sharding)
    return jax.make_array_from_process_local_data(sharding, x_local, global_shape)


def fetch_replicated(x) -> np.ndarray:
    """Host value of an array that must be identical on all processes.

    Works for replicated outputs of jitted computations (loss scalars, summed
    metrics). For non-fully-addressable arrays this gathers via
    ``jax.experimental.multihost_utils``.
    """
    if isinstance(x, jax.Array) and not (x.is_fully_addressable or x.is_fully_replicated):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def sync_processes(name: str = "sync") -> None:
    """Barrier across processes (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
