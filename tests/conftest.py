"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that multi-chip
sharding paths (pjit/shard_map over a Mesh) are exercised without TPU
hardware — the same test code runs unmodified on a real v5e-8 slice
(SURVEY.md §4.4).  Must run before jax initializes a backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force, don't setdefault: the ambient environment may carry an empty or
# tpu value, which would silently run the whole suite over the device
# tunnel (slow, and without the 8 virtual devices).  Opt out with
# BTCS_TPU_TESTS=1 to run the hardware-gated Pallas regression tests on
# the real TPU:
#   BTCS_TPU_TESTS=1 python -m pytest tests/test_pallas_kernels.py -q
_TPU_TESTS = os.environ.get("BTCS_TPU_TESTS") == "1"
if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon device plugin overrides JAX_PLATFORMS at import time; the
# config knob set post-import wins.
if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: compile-bound test times drop massively
# on repeat runs (single-core host; each XLA compile is tens of seconds).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same stream regardless of
    # which other tests ran (a shared stream made borderline
    # differential cases order-dependent).
    return np.random.default_rng(0)
