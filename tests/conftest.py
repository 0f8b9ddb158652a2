"""Test configuration: CPU backend with a virtual 8-device mesh.

The axon sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so platform
selection must be reconfigured post-import (before first backend use).
float64 is enabled globally for golden-parity math; tests construct arrays
in explicit dtypes.
"""

import os

# Belt and braces for subprocesses spawned by tests.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
