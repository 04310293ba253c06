"""Tracing / metrics / observability (SURVEY.md §5).

The reference has no instrumentation at all; its only counters are the
consumed/produced totals exposed on the public structs (deflator.h:191-203,
zstrm.h:117-131). This framework adds:

  - Stage timers with GB/s derivation (host wall clock around device calls),
  - byte counters mirroring the reference's srcend/tgtend/total semantics,
  - optional XLA profiler traces (jax.profiler) for kernel-level analysis.

Usage:
    prof = Profiler()
    with prof.stage("encode", nbytes=len(data)):
        ...
    prof.report()   # dict of {stage: {seconds, bytes, GBps, calls}}
"""
from __future__ import annotations

import contextlib
import time


class Profiler:
    def __init__(self, trace_dir: str | None = None):
        self.stages: dict[str, dict] = {}
        self.trace_dir = trace_dir
        self._tracing = False

    @contextlib.contextmanager
    def stage(self, name: str, nbytes: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stages.setdefault(
                name, {"seconds": 0.0, "bytes": 0, "calls": 0})
            s["seconds"] += dt
            s["bytes"] += nbytes
            s["calls"] += 1

    @contextlib.contextmanager
    def xla_trace(self):
        """Wrap a region in a jax.profiler trace (kernel-level timeline)."""
        if self.trace_dir is None:
            yield
            return
        import jax
        jax.profiler.start_trace(self.trace_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def report(self) -> dict:
        out = {}
        for k, s in self.stages.items():
            gbps = (s["bytes"] / s["seconds"] / 1e9) if s["seconds"] else 0.0
            out[k] = {**s, "GBps": gbps}
        return out


_global = Profiler()


def global_profiler() -> Profiler:
    return _global
