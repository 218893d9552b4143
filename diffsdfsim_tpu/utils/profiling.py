"""Profiling / tracing helpers.

The reference has no profiling subsystem (SURVEY §5.1: commented @profile
decorators and wall-clock prints only). Here:

- `trace(path)` — context manager around jax.profiler for TensorBoard traces
- `Timer` — wall-clock phase timing with device synchronization
- `annotate(name)` — XLA-visible named region (shows up in traces)
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a TensorBoard-viewable device trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation


class Timer:
    """Wall-clock phase timer that synchronizes the device."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v*1e3:.2f} ms ({v/total*100:.1f}%)" for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])]
        return "\n".join(lines)
