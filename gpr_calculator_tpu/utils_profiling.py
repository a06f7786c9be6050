"""Tracing / profiling helpers.

The reference's observability is per-rank cProfile dumps
(examples/test_mpi.py:10-11,32-37) and ad-hoc wall-clock prints.  Here:
structured phase timers plus optional jax.profiler device traces.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    """Accumulating wall-clock phase timer.

    with timer.phase("descriptor"): ...
    print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        out = []
        for name, tot in rows:
            n = self.counts[name]
            out.append(f"{name:<24s} {tot:10.3f}s  x{n:<6d} "
                       f"{tot / n * 1e3:9.2f} ms/call")
        return "\n".join(out)

    def json(self) -> str:
        return json.dumps({k: {"total_s": v, "calls": self.counts[k]}
                           for k, v in self.totals.items()})


@contextlib.contextmanager
def device_trace(logdir: Optional[str] = None):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
