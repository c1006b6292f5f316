"""Test configuration: force CPU with an 8-device virtual mesh BEFORE jax import.

Pallas kernels run in interpret mode on CPU (selected inside the ops via
jax.default_backend()); sharding tests use the 8 virtual devices.
"""

import os

# Force override: the shell presets JAX_PLATFORMS=axon (remote TPU tunnel), which
# would route every tiny test op through the tunnel. Set GLIC_TEST_TPU=1 to opt out
# and run the suite against the real chip.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if os.environ.get("GLIC_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The container's sitecustomize imports jax before conftest runs (to register
    # the axon TPU plugin), so jax has already read JAX_PLATFORMS=axon; override
    # through the config API before any backend is initialized.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
