"""Runtime setup helpers (compile cache, logging).

First XLA compiles take tens of seconds; the persistent compilation cache
makes repeat CLI invocations (the chained pipeline's separate stages) start
hot. Called by every CLI entry point.
"""

from __future__ import annotations

import logging
import os


def setup_runtime(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "ARTTTS_COMPILE_CACHE", os.path.expanduser("~/.cache/arttts_tpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        logging.getLogger("arttts_tpu").debug("compile cache disabled: %s", e)
