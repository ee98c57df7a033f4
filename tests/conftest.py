"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-only CI strategy (makani .github/workflows/
tests.yml) while enabling multi-device sharding tests without TPU hardware.

The container pins ``JAX_PLATFORMS=axon`` (a remote-TPU tunnel) which is far
too slow for a test suite and exposes a single device, so we override the
platform to CPU *before any backend is initialized* and fan it out to 8
virtual devices.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite re-jits the same small models on
# every run; caching cuts repeat wall-clock by minutes
jax.config.update("jax_compilation_cache_dir", "/tmp/makani_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
