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

if not os.environ.get("PLDEPTH_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
