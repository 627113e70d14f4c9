"""Test configuration: force an 8-device CPU platform.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(mesh-batched filtering, particle-sharded BPF) are exercised without TPU
hardware.

Note: this environment's sitecustomize registers a remote-TPU PJRT plugin
and overwrites ``jax_platforms`` at import time, so setting the
``JAX_PLATFORMS`` env var is not enough — we must also reset the jax config
after import (before any backend is initialized).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_files():
    """Bound per-process compile-cache growth: the full suite is ~1000 XLA
    CPU compiles, and a single process segfaults inside backend_compile
    once enough executables accumulate (round-3 verdict). Belt next to the
    per-file xdist workers (pyproject addopts)."""
    yield
    jax.clear_caches()
