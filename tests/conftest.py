"""Test harness setup.

Tests run on an 8-device virtual CPU mesh so multi-chip sharding is exercised
without TPU hardware (SURVEY.md §4: multi-chip tests via
``xla_force_host_platform_device_count``).

Note: pytest plugins (jaxtyping) import jax before this conftest runs, and
JAX snapshots ``JAX_PLATFORMS`` at import — so we must override through
``jax.config`` rather than ``os.environ`` (the ambient environment points JAX
at the axon TPU tunnel). Set PLDEPTH_TEST_TPU=1 to run the suite on real TPU.
"""

import os

import jax

# XLA:CPU's cross-device collectives rendezvous hard-aborts the process if
# the 8 virtual devices don't all reach an all-reduce within 40s — which a
# 1-core host under load can exceed (observed: intermittent silent SIGABRT in
# rendezvous.cc). The flag is read when the CPU client initializes, which is
# lazy, so setting it here (before any backend use) is early enough.
_flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip()

if not os.environ.get("PLDEPTH_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    # XLA:CPU's full optimization pipeline costs minutes per train-step
    # compile on this 1-core host and buys nothing for correctness tests
    # (measured: smoke-model chain compile 100s -> 49s, loss shifts ~3e-7
    # rel — far inside every tolerance in the suite). PLDEPTH_TEST_OPT=1
    # restores full optimization (e.g. before relaxing a tolerance).
    if not os.environ.get("PLDEPTH_TEST_OPT"):
        jax.config.update("jax_disable_most_optimizations", True)

# Persistent compilation cache: full train-step compiles take minutes on
# this 1-core host and dominate suite wall time; unchanged computations hit
# the disk cache on re-runs. Keyed by HLO+platform, so CPU/TPU coexist.
_cache_dir = os.environ.get(
    "PLDEPTH_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
# 1 s (not the 5 s default): the suite compiles many 2-4 s programs whose
# accumulated re-compiles dominate once the big ones are cached.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
