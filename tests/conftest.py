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

# Persistent XLA compilation cache: the suite is compile-dominated, and the
# cache key is the HLO hash (code changes always recompile). A cold run pays
# the same; warm reruns compile ~3x faster. EQUIHGNN_TPU_COMPILE_CACHE=0
# disables.
_cache = os.environ.get(
    "EQUIHGNN_TPU_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "equihgnn_tpu_xla"),
)
if _cache not in ("0", ""):
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
