"""Cross-layout ("flexible") checkpoint restore (ref tests/distributed/
tests_distributed_checkpoint.py: save under one model-parallel layout,
restore under another). Orbax sharded checkpoints store global arrays, so a
tree saved from a spatial h2w2 mesh must restore bit-exactly onto a pure
data-parallel mesh, a differently-carved spatial mesh, and plain host
arrays — and vice versa.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from makani_tpu.utils.checkpoint_helpers import CheckpointManager
from makani_tpu.utils.yparams import ParamsBase


def _mesh(shape, names):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "encoder": {"kernel": rng.standard_normal((8, 16)).astype(np.float32)},
        "blocks": [rng.standard_normal((4, 8, 8)).astype(np.float32) for _ in range(2)],
        "scale": np.float32(rng.standard_normal()),
    }


def _shard(tree, mesh, spec_fn):
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec_fn(np.asarray(x)))), tree)


def _spec_rows(x):
    # shard the leading axis over "h" when divisible; replicate scalars
    return P("h") if x.ndim >= 1 and x.shape[0] % 2 == 0 else P()


def _spec_cols(x):
    return P(None, "w") if x.ndim >= 2 and x.shape[1] % 4 == 0 else P()


def _assert_tree_equal(got, want):
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def _manager(tmp_path):
    return CheckpointManager(ParamsBase(dict(experiment_dir=str(tmp_path), checkpoint_num_versions=2)))


def test_spatial_save_dp_restore(tmp_path):
    """Save from an h2w2 spatial carving, restore onto 8-way replication."""
    m = _manager(tmp_path)
    tree = _tree(0)
    mesh_a = _mesh((2, 2), ("h", "w"))
    sharded = _shard(tree, mesh_a, _spec_rows)
    m.save(sharded, None, {"iters": 7}, is_best=True)

    mesh_b = _mesh((8,), ("batch",))
    target = _shard(jax.tree.map(jnp.zeros_like, tree), mesh_b, lambda x: P())
    model, _, meta = m.restore_best(target)
    assert meta["iters"] == 7
    _assert_tree_equal(model, tree)
    # restored leaves carry the *target* sharding, not the saved one
    enc = model["encoder"]["kernel"]
    assert enc.sharding.mesh.axis_names == ("batch",)


def test_dp_save_spatial_restore_recarved(tmp_path):
    """Save replicated, restore split across a different axis than saved."""
    m = _manager(tmp_path)
    tree = _tree(1)
    mesh_a = _mesh((8,), ("batch",))
    m.save(_shard(tree, mesh_a, lambda x: P()), None, {})

    mesh_b = _mesh((2, 4), ("h", "w"))
    target = _shard(jax.tree.map(jnp.zeros_like, tree), mesh_b, _spec_cols)
    model, _, _ = m.restore_latest(target)
    _assert_tree_equal(model, tree)
    enc = model["encoder"]["kernel"]
    assert enc.sharding.spec == P(None, "w")
    # each shard holds only its 16/4-wide slice
    assert enc.addressable_shards[0].data.shape == (8, 4)


def test_sharded_save_host_restore(tmp_path):
    """A sharded checkpoint restores into plain host numpy arrays (the
    inference / model-package path runs unsharded)."""
    m = _manager(tmp_path)
    tree = _tree(2)
    mesh = _mesh((2, 2), ("h", "w"))
    m.save(_shard(tree, mesh, _spec_rows), None, {})
    target = jax.tree.map(jnp.zeros_like, _tree(2))
    model, _, _ = m.restore_latest(target)
    _assert_tree_equal(model, tree)


def test_optimizer_state_follows_layout(tmp_path):
    """Optimizer moments restore under the new carving too (the resume-on-
    more-chips scenario)."""
    m = _manager(tmp_path)
    tree = _tree(3)
    opt = {"mu": jax.tree.map(lambda x: x * 0.1, tree), "nu": jax.tree.map(lambda x: x * 0.01, tree)}
    mesh_a = _mesh((2, 2), ("h", "w"))
    m.save(_shard(tree, mesh_a, _spec_rows), _shard(opt, mesh_a, _spec_rows), {"step": 11})

    mesh_b = _mesh((4, 2), ("h", "w"))
    t_target = _shard(jax.tree.map(jnp.zeros_like, tree), mesh_b, _spec_cols)
    o_target = _shard(jax.tree.map(jnp.zeros_like, opt), mesh_b, _spec_cols)
    model, opt_restored, meta = m.restore_latest(t_target, o_target)
    assert meta["step"] == 11
    _assert_tree_equal(model, tree)
    _assert_tree_equal(opt_restored, opt)


def test_rotation_preserves_cross_layout_best(tmp_path):
    """Rotation keeps the best version restorable under a new mesh even
    after num_versions newer saves."""
    m = _manager(tmp_path)
    mesh_a = _mesh((2, 2), ("h", "w"))
    best_tree = _tree(10)
    m.save(_shard(best_tree, mesh_a, _spec_rows), None, {"v": 1}, is_best=True)
    for i in range(3):
        m.save(_shard(_tree(20 + i), mesh_a, _spec_rows), None, {"v": 2 + i})

    mesh_b = _mesh((8,), ("batch",))
    target = _shard(jax.tree.map(jnp.zeros_like, best_tree), mesh_b, lambda x: P())
    model, _, meta = m.restore_best(target)
    assert meta["v"] == 1
    _assert_tree_equal(model, best_tree)
