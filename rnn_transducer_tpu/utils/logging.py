"""Run metrics logging + optional device profiling.

The reference logs with prints; this framework writes structured JSONL
(one record per log call) so runs are machine-comparable, and wraps
jax.profiler for on-demand TPU traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time


class MetricsLogger:
    """Append-only JSONL metrics log (plus mirrored stderr lines)."""

    def __init__(self, path: str | None = None, mirror: bool = True):
        self.path = path
        self.mirror = mirror
        self._f = open(path, "a") if path else None
        self.t0 = time.time()

    def log(self, **record):
        record.setdefault("wall_s", round(time.time() - self.t0, 3))
        line = json.dumps(record)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()
        if self.mirror:
            print(line, file=sys.stderr, flush=True)

    def close(self):
        if self._f:
            self._f.close()


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """Capture a jax.profiler trace (TensorBoard format) around a block.

    No-op when trace_dir is falsy. Usage:
        with device_trace("/tmp/trace"):
            train_steps(...)
    """
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
