"""Structured metric logging + profiler hooks.

The reference logs via print/tqdm only and lists (but never imports) wandb
(SURVEY §5). Here: JSONL metric streams (one object per line with step/epoch
tags) and a jax.profiler context for trace capture — the observability layer
for the throughput work.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import IO


class MetricLogger:
    """Append-only JSONL metric log."""

    def __init__(self, path: str | None):
        self.path = path
        self._fh: IO | None = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")

    def log(self, tag: str, step: int | None = None, **metrics):
        rec = {"ts": time.time(), "tag": tag}
        if step is not None:
            rec["step"] = int(step)
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """images/sec meter around a training loop."""

    def __init__(self):
        self.images = 0
        self.t0 = None

    def start(self):
        self.t0 = time.perf_counter()
        self.images = 0

    def add(self, n: int):
        self.images += n

    @property
    def images_per_sec(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.images / dt if dt > 0 else float("nan")
