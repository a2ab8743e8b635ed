"""Tracing / profiling hooks (SURVEY.md §5 auxiliary subsystems).

The reference's observability is wall-clock prints (predict.py:106-116,
training.py:175,244). Here:

  - `trace(dir)` context manager wraps jax.profiler for full XLA traces
    viewable in TensorBoard/Perfetto;
  - `Throughput` accumulates the per-image megapixels/second accounting the
    BASELINE.json metric is defined in, with percentile summaries;
  - `timed` context manager for simple labeled wall-clock sections.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace around a code block (TensorBoard-viewable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"{label}: {time.perf_counter() - t0:.3f}s")


class Throughput:
    """Per-image MP/s accounting (the benchmark's unit)."""

    def __init__(self):
        self.records: list[tuple[int, float]] = []  # (pixels, seconds)

    @contextlib.contextmanager
    def image(self, n_pixels: int):
        t0 = time.perf_counter()
        yield
        self.records.append((n_pixels, time.perf_counter() - t0))

    def add(self, n_pixels: int, seconds: float):
        self.records.append((n_pixels, seconds))

    def summary(self) -> dict:
        if not self.records:
            return {"images": 0}
        mps = np.array([p / 1e6 / s for p, s in self.records])
        total_mp = sum(p for p, _ in self.records) / 1e6
        total_s = sum(s for _, s in self.records)
        return {
            "images": len(self.records),
            "total_megapixels": round(total_mp, 3),
            "total_seconds": round(total_s, 3),
            "mp_per_s_overall": round(total_mp / total_s, 3),
            "mp_per_s_median": round(float(np.median(mps)), 3),
            "mp_per_s_p10": round(float(np.percentile(mps, 10)), 3),
            "mp_per_s_p90": round(float(np.percentile(mps, 90)), 3),
        }
