"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-world "fake backend" the reference lacks (SURVEY.md §4): multi-chip
sharding logic is validated on host CPU devices; numerics run in float32.
"""

import os

# NOTE: the environment exports JAX_PLATFORMS=axon (a tunneled TPU); it must be
# overridden unconditionally, and the axon plugin also ignores the env var, so
# jax.config.update below is the authoritative switch.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

# persistent XLA compile cache makes test re-runs dramatically faster
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
