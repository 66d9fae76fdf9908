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

# No persistent compile cache in tests: CLI tests run setup_runtime(), and a
# suite writing ~/.cache/arttts_tpu_xla while a TPU process compiles against
# it segfaulted in the zstd cache serializer (r3, twice — crash stack:
# compilation_cache.put_executable_and_time).  CPU test compiles are cheap.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np
import pytest

# Pre-seed the reference's Cython MAS package with a working stub BEFORE any
# test imports /root/reference/src code. Several test modules import reference
# modules (model families, configs) in different orders; whichever goes first
# binds `model.monotonic_align` inside the reference's `model.tts`, so the
# entry must already be the full stub — a late or empty stub breaks
# whichever reference-parity test runs second (AttributeError: maximum_path).
import sys as _sys
import types as _types

if "model.monotonic_align" not in _sys.modules:
    _stub = _types.ModuleType("model.monotonic_align")

    def _stub_maximum_path(value, mask):
        import torch

        from arttts_tpu.ops.mas import mas_reference_numpy

        v = (value * mask).detach().cpu().numpy().astype(np.float32)
        m = mask.detach().cpu().numpy()
        t_xs = m.sum(1)[:, 0].astype(np.int32)
        t_ys = m.sum(2)[:, 0].astype(np.int32)
        path = mas_reference_numpy(v, t_xs, t_ys)
        return torch.from_numpy(path).to(dtype=value.dtype)

    _stub.maximum_path = _stub_maximum_path
    _sys.modules["model.monotonic_align"] = _stub


@pytest.fixture
def rng():
    return np.random.default_rng(37)
