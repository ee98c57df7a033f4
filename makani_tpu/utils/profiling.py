"""Profiling utilities (ref makani/utils/profiling.py:21-93).

TPU equivalents of the reference's capture paths: `jax.profiler` traces
(viewable in TensorBoard/Perfetto, replacing torch.profiler + Chrome traces
and the CUDA/nsys range capture) plus the same lightweight ``Timer`` context
manager used to log per-phase init timings (ref driver.py:57-62).
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger(__name__)

__all__ = ["Timer", "trace", "annotate"]


class Timer:
    """Context manager measuring wall time in seconds."""

    def __init__(self, name: str = "", log: bool = False):
        self.name = name
        self.log = log

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.duration = time.perf_counter() - self.start
        if self.log:
            logger.info(f"{self.name}: {self.duration:.3f}s")
        return False

    def __str__(self):
        return f"{self.duration:.3f}s"


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed region.

    Replaces the reference's torch.profiler schedule + trace_handler
    (profiling.py:21-38) and the cudart range capture (profiling.py:40-93).
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope showing up in profiler timelines (replaces NVTX ranges,
    ref deterministic_trainer.py:514-515)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
