"""Test harness: force an 8-virtual-device CPU JAX backend.

The sandbox's sitecustomize imports jax at interpreter boot and pins
JAX_PLATFORMS=axon (one remote TPU), so env vars are already snapshotted
by the time pytest runs — we must override through jax.config instead.
The 8-device CPU mesh is the JAX-native "fake backend" for validating
sharding without a pod (SURVEY.md §4).
"""
import os

# XLA reads this at first backend init, which hasn't happened yet.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
