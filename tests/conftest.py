"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip hardware is not available in CI; all sharding tests run on
``--xla_force_host_platform_device_count=8`` virtual CPU devices, and the real
TPU path is exercised by the driver's bench runs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax (registering the TPU tunnel
# backend) before conftest runs, so the env var alone is too late — override
# the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
