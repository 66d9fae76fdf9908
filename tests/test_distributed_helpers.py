"""Single-host behavior of the multi-host glue + runtime setup."""

import jax
import pytest


def test_init_distributed_single_host():
    from arttts_tpu.parallel.distributed import init_distributed

    info = init_distributed()  # no-op on one host
    assert info.process_index == 0
    assert info.process_count == 1
    assert info.global_devices == jax.device_count()
    assert info.local_devices == jax.local_device_count()


def test_setup_runtime(tmp_path):
    import jax

    from arttts_tpu.core.runtime import setup_runtime

    prev = jax.config.jax_compilation_cache_dir
    try:
        cache = tmp_path / "xla_cache"
        setup_runtime(str(cache))
        assert cache.exists()
        # idempotent
        setup_runtime(str(cache))
    finally:
        # restore: leaving the global cache dir pointing at a deleted
        # tmp_path made later compiles segfault in the cache serializer
        jax.config.update("jax_compilation_cache_dir", prev)
