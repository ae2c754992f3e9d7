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
# NO persistent compilation cache for the CPU test suite.  In this
# environment the XLA:CPU AOT serialization path is broken both ways:
# cache WRITES abort long processes (SIGABRT in put_executable_and_time,
# reproduced 3x) and cache READS can SIGSEGV on deserialization (the
# cpu_aot_loader logs a compile-machine/host-machine feature mismatch for
# entries written on THIS host, then crashes loading some of them).  Cold
# compiles are slow but safe.  The TPU-backend bench keeps its own cache
# (.jax_cache) — TPU executables round-trip fine.

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(20260817)
