"""Runtime setup: persistent compilation cache and device queries.

First-compile of the gather-heavy render graph over the axon tunnel measured
at ~5 min; the persistent cache turns repeat launches into seconds.
"""

from __future__ import annotations

import os


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "NDJIR_TPU_CACHE", os.path.expanduser("~/.cache/ndjir_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def device_kind() -> str:
    import jax

    return jax.devices()[0].device_kind
