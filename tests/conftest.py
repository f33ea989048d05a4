"""Test configuration: force a deterministic 8-device virtual CPU mesh.

All unit tests run on CPU with 8 virtual devices so sharding logic is
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path). Set before importing jax anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
