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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
