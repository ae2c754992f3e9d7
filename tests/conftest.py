"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh (the driver separately
dry-runs the multichip path via __graft_entry__.dryrun_multichip).  The axon
TPU plugin pins JAX_PLATFORMS=axon at interpreter start, so we override via
jax.config *before* any backend is initialized.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent-cache READS are always on (warm starts); WRITES are opt-in via
# PLONKATHON_CACHE_WRITES=1.  In this environment, long pytest processes
# abort (SIGABRT/SIGSEGV inside jax's put_executable_and_time) after ~20+
# cache writes — reproduced three times in round 3, never in short
# processes.  Seeding the cache is done per test file (fresh process each,
# see README); the default read-only mode keeps any single long run safe.
_CACHE_WRITES = os.environ.get("PLONKATHON_CACHE_WRITES", "0") == "1"
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs", 0.2 if _CACHE_WRITES else 1e9
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(20260817)
