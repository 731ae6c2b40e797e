"""Frame-phase profiling scopes.

The reference brackets every frame phase with Unity Profiler samples
(RenderManager.cs:119-190, SURVEY.md §5 "Tracing / profiling").  TPU equivalent:
named wall-clock scopes (accumulated per phase) + optional jax.profiler traces for
device-side timelines.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class FrameProfiler:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._trace_ctx = None

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:<28} {tot * 1e3:9.1f} ms total "
                         f"{tot / max(n, 1) * 1e3:8.2f} ms/call x{n}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()

    def start_device_trace(self, log_dir: str):
        """Begin a jax.profiler trace (view with TensorBoard/XProf)."""
        import jax

        jax.profiler.start_trace(log_dir)
        self._trace_ctx = log_dir

    def stop_device_trace(self):
        import jax

        jax.profiler.stop_trace()
        self._trace_ctx = None


PROFILER = FrameProfiler()
