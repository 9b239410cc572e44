"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (hence top of conftest).
Multi-chip sharding tests use this mesh; TPU hardware is exercised only by
bench.py / the driver.
"""

import os

# force-override: the ambient environment pins JAX_PLATFORMS=axon (the
# tunneled TPU) -- tests must run on local CPU with a virtual 8-device mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
