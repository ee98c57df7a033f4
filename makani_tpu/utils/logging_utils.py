"""Logging setup (ref makani/utils/logging_utils.py)."""

from __future__ import annotations

import logging
import os

__all__ = ["config_logger", "log_to_file", "log_versions"]

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
