"""Test configuration: force the CPU backend with 8 virtual devices so the
pjit/sharding data-parallel path can be exercised without TPU hardware.

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# fp32 matmuls on CPU for parity tests
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax

# The environment's sitecustomize force-registers the 'axon' TPU platform and
# overwrites jax_platforms AFTER env vars are read; undo that here so tests
# run on the 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
