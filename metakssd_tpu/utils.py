"""Observability: stage timers and structured logging.

The reference had only printf progress lines and unused ms/µs helpers
(mytime.c); here every pipeline stage can record wall time and counters,
dumped as one JSON line for machine consumption or pretty text for
humans.  Enable with MKSSD_LOG=1 (text) or MKSSD_LOG=json.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time


class StageTimer:
    def __init__(self, enabled: bool | None = None):
        env = os.environ.get("MKSSD_LOG", "")
        self.enabled = bool(env) if enabled is None else enabled
        self.json_mode = env == "json"
        self.stages: list[tuple[str, float]] = []
        self.counters: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.stages.append((name, dt))
            if self.enabled and not self.json_mode:
                print(f"[mkssd] {name}: {dt:.3f}s", file=sys.stderr)

    def count(self, name: str, value: float) -> None:
        self.counters[name] = self.counters.get(name, 0) + value

    def report(self) -> dict:
        rep = {"stages": {n: round(t, 4) for n, t in self.stages},
               "counters": self.counters}
        if self.enabled and self.json_mode:
            print(json.dumps(rep), file=sys.stderr)
        return rep


TIMER = StageTimer()


@contextlib.contextmanager
def jax_profile(outdir: str | None):
    """Optional jax.profiler trace around a block (MKSSD_TRACE=dir)."""
    outdir = outdir or os.environ.get("MKSSD_TRACE")
    if not outdir:
        yield
        return
    import jax
    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
