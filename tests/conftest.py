"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-world "fake backend" the reference lacks (SURVEY.md §4): multi-chip
sharding logic is validated on host CPU devices; numerics run in float32.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
