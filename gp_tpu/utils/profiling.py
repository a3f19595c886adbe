"""Tracing / profiling helpers.

The reference has no profiling infrastructure beyond ad-hoc std::chrono
prints (SURVEY.md section 5).  Here:

  * `phase(name)` — wall-clock context manager that block_until_ready's
    outstanding device work, so phases measure device time, not dispatch.
  * `device_trace(logdir)` — jax.profiler trace context; open the dump with
    TensorBoard / xprof to read per-op device time and MXU utilization.
  * `Timer` — accumulating named phase timers (printable summary).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def phase(name: str, sink=None):
    """Time a phase to the wall clock, flushing device work at both ends."""
    (jax.effects_barrier if hasattr(jax, "effects_barrier") else lambda: None)()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        jax.block_until_ready(jax.numpy.zeros(()))
        dt = time.perf_counter() - t0
        if sink is None:
            print(f"[gp_tpu] {name}: {dt:.3f}s")
        else:
            sink(name, dt)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace (TensorBoard format): per-op device timings,
    memory, and MXU utilization on TPU."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating phase timer: `with t("fit"): ...`; print(t) at the end."""

    def __init__(self):
        self.acc = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            jax.block_until_ready(jax.numpy.zeros(()))
            self.acc[name] += time.perf_counter() - t0
            self.count[name] += 1

    def __str__(self):
        rows = [f"{k}: {v:.3f}s (x{self.count[k]})"
                for k, v in sorted(self.acc.items())]
        return "; ".join(rows) or "(no phases)"
