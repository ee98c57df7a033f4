"""Checkpoint save/restore (ref makani/utils/checkpoint_helpers.py:45-379 and
driver.py:391-684).

Orbax-based. The reference maintains two formats — "legacy" (one file per
model-parallel rank) and "flexible" (gathered full tensors, restorable into
any parallel layout). Orbax sharded checkpoints are natively "flexible":
arrays are saved with their global shapes and restored into whatever sharding
the running mesh prescribes, so a single format covers both. Versioned
rotation (``checkpoint_num_versions``) and best-checkpoint tracking follow
the reference (deterministic_trainer.py:404-447).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "get_latest_checkpoint_version"]


def get_latest_checkpoint_version(checkpoint_dir: str) -> Optional[int]:
    if not os.path.isdir(checkpoint_dir):
        return None
    versions = []
    for name in os.listdir(checkpoint_dir):
        if name.startswith("ckpt_v") and name[6:].isdigit():
            versions.append(int(name[6:]))
    return max(versions) if versions else None


class CheckpointManager:
    def __init__(self, params):
        exp_dir = params.get("experiment_dir", params.get("exp_dir", "/tmp/makani_tpu_exp"))
        self.checkpoint_dir = params.get("checkpoint_dir", os.path.join(exp_dir, "checkpoints"))
        self.num_versions = params.get("checkpoint_num_versions", 3)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, version: int) -> str:
        return os.path.join(self.checkpoint_dir, f"ckpt_v{version}")

    def save(self, model_params, opt_state, meta: dict, is_best: bool = False):
        version = (get_latest_checkpoint_version(self.checkpoint_dir) or 0) + 1
        path = self._path(version)
        # model and optimizer state live in separate sub-checkpoints so
        # inference can restore weights without knowing the optimizer pytree
        os.makedirs(path, exist_ok=True)
        self._ckptr.save(os.path.abspath(os.path.join(path, "model")), model_params)
        if opt_state is not None:
            self._ckptr.save(os.path.abspath(os.path.join(path, "opt")), opt_state)
        self._ckptr.wait_until_finished()
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

        if is_best:
            best = os.path.join(self.checkpoint_dir, "best_checkpoint.txt")
            with open(best, "w") as f:
                f.write(str(version))

        # rotate old versions, keeping the best
        best_version = self.best_version()
        versions = sorted(
            int(n[6:]) for n in os.listdir(self.checkpoint_dir) if n.startswith("ckpt_v") and n[6:].isdigit()
        )
        for v in versions[: -self.num_versions]:
            if v != best_version:
                shutil.rmtree(self._path(v), ignore_errors=True)

    def best_version(self) -> Optional[int]:
        best = os.path.join(self.checkpoint_dir, "best_checkpoint.txt")
        if os.path.isfile(best):
            with open(best) as f:
                return int(f.read().strip())
        return None

    def restore(self, version: int, model_params, opt_state=None):
        path = self._path(version)
        model = self._ckptr.restore(os.path.abspath(os.path.join(path, "model")), model_params)
        opt = None
        if opt_state is not None and os.path.isdir(os.path.join(path, "opt")):
            opt = self._ckptr.restore(os.path.abspath(os.path.join(path, "opt")), opt_state)
        meta = {}
        meta_path = os.path.join(path, "meta.json")
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return model, opt, meta

    def restore_latest(self, model_params, opt_state=None):
        version = get_latest_checkpoint_version(self.checkpoint_dir)
        if version is None:
            return None
        return self.restore(version, model_params, opt_state)

    def restore_best(self, model_params, opt_state=None):
        version = self.best_version() or get_latest_checkpoint_version(self.checkpoint_dir)
        if version is None:
            return None
        return self.restore(version, model_params, opt_state)
