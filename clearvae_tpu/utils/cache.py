"""Persistent XLA compilation cache.

The styling program (6 vmapped corruption kernels under lax.switch) and the
scanned epoch programs take O(minutes) to compile cold; a persistent cache
makes every later process start hot. Call once early (bench.py and the
experiment runners do)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "CLEARVAE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "clearvae_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
