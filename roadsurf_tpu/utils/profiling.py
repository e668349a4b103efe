"""Tracing / profiling utilities (aux subsystem, SURVEY §5.1).

The reference only has tic/toc prints and tqdm bars; here:
* :class:`StageTimer` — named wall-clock stages with items/sec counters and
  a printable report (the per-stage tiles/sec telemetry the pipeline logs);
* :func:`trace` — context manager around ``jax.profiler`` so any block can
  dump a TensorBoard-loadable device trace when JAX runs on real hardware.
"""

from __future__ import annotations

import contextlib
import time

from .logging import logger


class StageTimer:
    """Accumulating named stage timer.

    >>> t = StageTimer()
    >>> with t.stage("fetch", items=64): ...
    >>> t.report()
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self.items: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            self.items[name] = self.items.get(name, 0) + items

    def report(self, log=logger) -> dict:
        out = {}
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            row = {"seconds": round(total, 3),
                   "calls": self.counts[name]}
            if self.items.get(name):
                row["items_per_sec"] = round(self.items[name] / total, 1)
            out[name] = row
            extra = (f", {row['items_per_sec']} items/s"
                     if "items_per_sec" in row else "")
            log.info(f"[stage] {name}: {total:.3f}s over "
                     f"{row['calls']} calls{extra}")
        return out


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:          # some backends lack profiling support
        logger.warning(f"profiler trace unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {log_dir}")
            except Exception as e:
                logger.warning(f"profiler stop failed: {e}")
