"""Test harness: force an 8-device virtual CPU mesh BEFORE jax imports.

This is the TPU-native analog of "test multi-node without a cluster":
sharding/collective code paths compile and run against 8 virtual CPU
devices, so DP/TP shardings are exercised in CI without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may import jax at interpreter start (sitecustomize
# registering a TPU plugin), which freezes env-var reads — override via
# config so tests run on 8 virtual CPU devices regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
