"""Differentiable collective primitives over mesh axes
(ref makani/mpu/mappings.py:38-240).

Thin shard_map-based equivalents of the reference's autograd-wrapped NCCL
collectives. Under pjit most of these are unnecessary — sharding constraints
imply them — but they remain useful inside manual `shard_map` regions (the
distributed transforms, ensemble transposes) and they document the mapping:

    copy_to_parallel_region      -> identity fwd / psum bwd
    reduce_from_parallel_region  -> psum fwd / identity bwd
    scatter_to_parallel_region   -> split fwd / all_gather bwd
    gather_from_parallel_region  -> all_gather fwd / split bwd
    distributed_transpose        -> all_to_all (self-transposing under AD)

All functions are meant to be called INSIDE a shard_map body where
``axis_name`` is a manual mesh axis; JAX autodiff provides the transposed
communication automatically, which is what the reference implements by hand
with custom autograd.Functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "copy_to_parallel_region",
    "reduce_from_parallel_region",
    "scatter_to_parallel_region",
    "gather_from_parallel_region",
    "distributed_transpose",
]


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def copy_to_parallel_region(x, axis_name: str):
    return x


def _copy_fwd(x, axis_name):
    return x, None


def _copy_bwd(axis_name, _res, g):
    return (lax.psum(g, axis_name),)


copy_to_parallel_region.defvjp(_copy_fwd, _copy_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def reduce_from_parallel_region(x, axis_name: str):
    """psum forward / identity backward (ref mappings.py:94-114). The custom
    backward matters: under check_vma=False JAX transposes psum to psum,
    which double-counts when paired with copy_to_parallel_region."""
    return lax.psum(x, axis_name)


def _reduce_fwd(x, axis_name):
    return lax.psum(x, axis_name), None


def _reduce_bwd(axis_name, _res, g):
    return (g,)


reduce_from_parallel_region.defvjp(_reduce_fwd, _reduce_bwd)


def scatter_to_parallel_region(x, dim: int, axis_name: str):
    """Keep only this shard's chunk along ``dim``. Differentiable: the
    transpose of dynamic_slice is the scatter-add the reference implements
    via all_gather in backward."""
    size = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    chunk = x.shape[dim] // size
    return lax.dynamic_slice_in_dim(x, idx * chunk, chunk, axis=dim)


def gather_from_parallel_region(x, dim: int, axis_name: str):
    return lax.all_gather(x, axis_name, axis=dim, tiled=True)


def distributed_transpose(x, split_dim: int, concat_dim: int, axis_name: str):
    """All-to-all exchanging which dimension is sharded
    (ref mappings.py:38-67: the Ulysses-style transpose)."""
    return lax.all_to_all(x, axis_name, split_axis=split_dim, concat_axis=concat_dim, tiled=True)
