"""Test configuration: force an 8-device virtual CPU platform so multi-device
mesh logic is exercised without TPU hardware (SURVEY.md §4 test strategy)."""

import os

# Must be set before jax is imported anywhere. Force CPU even if the outer
# environment points at a TPU (JAX_PLATFORMS=axon): the test suite exercises
# multi-device mesh logic on 8 virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize registers the axon TPU backend at interpreter
# start and pins jax_platforms; re-pin to CPU so the 8 virtual devices apply.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(37)
