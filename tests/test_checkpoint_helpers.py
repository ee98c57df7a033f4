"""CheckpointManager rotation/best semantics (ref tests/test_checkpoint_helpers.py,
test_save_restore.py): versioned save/restore round trip, rotation keeps at
most num_versions plus the best, best survives rotation, restore without
optimizer state, meta round trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.utils.checkpoint_helpers import CheckpointManager, get_latest_checkpoint_version
from makani_tpu.utils.yparams import ParamsBase


def _mgr(tmp_path, keep=2):
    return CheckpointManager(ParamsBase(dict(exp_dir=str(tmp_path), checkpoint_num_versions=keep)))


def _tree(v):
    return {"params": {"dense": {"kernel": jnp.full((3, 4), float(v)), "bias": jnp.zeros((4,))}}}


def _opt(v):
    return {"mu": jnp.full((3, 4), float(v))}


def test_save_restore_roundtrip(tmp_path):
    m = _mgr(tmp_path)
    m.save(_tree(1), _opt(1), {"epoch": 1, "loss": 0.5})
    model, opt, meta = m.restore_latest(_tree(0), _opt(0))
    np.testing.assert_allclose(np.asarray(model["params"]["dense"]["kernel"]), 1.0)
    np.testing.assert_allclose(np.asarray(opt["mu"]), 1.0)
    assert meta == {"epoch": 1, "loss": 0.5}


def test_rotation_keeps_num_versions_and_best(tmp_path):
    m = _mgr(tmp_path, keep=2)
    m.save(_tree(1), _opt(1), {"epoch": 1}, is_best=True)
    for v in (2, 3, 4, 5):
        m.save(_tree(v), _opt(v), {"epoch": v})
    assert get_latest_checkpoint_version(m.checkpoint_dir) == 5
    import os

    kept = sorted(int(n[6:]) for n in os.listdir(m.checkpoint_dir) if n.startswith("ckpt_v"))
    # the two most recent plus the protected best
    assert kept == [1, 4, 5]

    model, _, meta = m.restore_best(_tree(0), _opt(0))
    np.testing.assert_allclose(np.asarray(model["params"]["dense"]["kernel"]), 1.0)
    assert meta["epoch"] == 1


def test_restore_without_optimizer(tmp_path):
    m = _mgr(tmp_path)
    m.save(_tree(7), _opt(7), {"epoch": 7})
    model, opt, meta = m.restore_latest(_tree(0))  # inference path: no opt tree
    np.testing.assert_allclose(np.asarray(model["params"]["dense"]["kernel"]), 7.0)
    assert opt is None


def test_restore_latest_empty_dir(tmp_path):
    m = _mgr(tmp_path)
    assert m.restore_latest(_tree(0)) is None
    assert get_latest_checkpoint_version(str(tmp_path / "nope")) is None


def test_model_only_checkpoint(tmp_path):
    """Saving without opt_state (save_checkpoint: model-only mode)."""
    m = _mgr(tmp_path)
    m.save(_tree(3), None, {"epoch": 3})
    model, opt, _ = m.restore_latest(_tree(0), _opt(0))
    np.testing.assert_allclose(np.asarray(model["params"]["dense"]["kernel"]), 3.0)
    assert opt is None
