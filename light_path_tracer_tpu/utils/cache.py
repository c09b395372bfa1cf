"""Persistent XLA compilation cache.

First compiles of the big tracer programs cost minutes over the TPU
tunnel; caching them on disk makes every later process (CLI runs, bench,
tests) start in seconds. Safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "LPT_COMPILE_CACHE", os.path.expanduser("~/.cache/lpt_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the persistent cache: skip silently
