"""Logging setup (ref makani/utils/logging_utils.py)."""

from __future__ import annotations

import logging
import os

__all__ = ["config_logger", "log_to_file", "log_versions", "ExperimentLogger"]

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def config_logger(level=logging.INFO):
    logging.basicConfig(format=_FORMAT, level=level)


def log_to_file(logger_name=None, log_level=logging.INFO, log_filename="out.log"):
    os.makedirs(os.path.dirname(os.path.abspath(log_filename)), exist_ok=True)
    logger = logging.getLogger(logger_name)
    fh = logging.FileHandler(log_filename)
    fh.setLevel(log_level)
    fh.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(fh)


class ExperimentLogger:
    """Experiment metric tracker (the reference's wandb integration,
    driver.py wandb init/artifacts). Always appends one JSON line per step to
    ``metrics.jsonl`` under the experiment dir; mirrors to wandb when the
    package is installed and ``log_to_wandb`` is set (not present in the TPU
    image, so the file is the source of truth)."""

    def __init__(self, exp_dir: str, config: dict | None = None, log_to_wandb: bool = False, project: str = "makani-tpu", name: str | None = None):
        os.makedirs(exp_dir, exist_ok=True)
        self.path = os.path.join(exp_dir, "metrics.jsonl")
        self._wandb = None
        if log_to_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project, name=name, config=config or {}, dir=exp_dir)
            except ImportError:
                logging.getLogger(__name__).warning("wandb requested but not installed; logging to metrics.jsonl only")
        if config is not None:
            import json

            with open(os.path.join(exp_dir, "config.json"), "w") as f:
                json.dump({k: v for k, v in config.items() if _is_jsonable(v)}, f, indent=2, default=str)

    def log(self, metrics: dict, step: int | None = None):
        import json
        import time as _time

        row = {k: v for k, v in metrics.items() if _is_jsonable(v)}
        if step is not None:
            row["step"] = step
        row["_time"] = _time.time()
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()


def _is_jsonable(v):
    return isinstance(v, (int, float, str, bool, type(None), list, tuple, dict))


def log_versions():
    import subprocess

    import jax

    logger = logging.getLogger()
    try:
        git_hash = subprocess.check_output(["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL).strip().decode()
        logger.info(f"git hash: {git_hash}")
    except Exception:
        pass
    logger.info(f"jax version: {jax.__version__}")
    logger.info(f"devices: {jax.devices()}")
