"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding logic is validated on a virtual CPU mesh (the driver
separately dry-runs `__graft_entry__.dryrun_multichip`); single-chip numerics
also run on CPU for determinism and to keep the TPU free for benchmarking.
"""

import os

# Force-override: the image's sitecustomize initializes JAX for the axon TPU
# platform before conftest runs, so env vars alone are too late — use the
# config API. XLA_FLAGS is still read lazily at CPU-backend init.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
