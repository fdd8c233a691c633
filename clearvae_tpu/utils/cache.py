"""Persistent XLA compilation cache.

The styling program (6 vmapped corruption kernels under lax.switch) and the
scanned epoch programs take O(minutes) to compile cold; a persistent cache
makes every later process start hot. Call once early (bench.py and the
experiment runners do).

This is also the chokepoint where the single-TPU-process lock is taken
(utils/lock.py): every TPU entry point calls this before touching the
device, so wiring the flock here guarantees no runner is missed. CPU-backed
processes (the test suite) skip the lock."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    from clearvae_tpu.utils.lock import acquire_tpu_lock

    acquire_tpu_lock()

    import jax

    path = path or os.environ.get(
        "CLEARVAE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "clearvae_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
