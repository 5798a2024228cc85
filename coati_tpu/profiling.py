"""Profiling and throughput accounting (SURVEY.md section 5 equivalent).

The reference measures performance externally (google-benchmark + GNU time);
here profiling is first-class: jax.profiler trace capture plus a running
cells/sec + alignments/sec meter used by bench.py and the batch verb.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf) if a
    directory is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class ThroughputMeter:
    """Accumulates (cells, pairs, seconds) across kernel calls."""

    def __init__(self) -> None:
        self.cells = 0
        self.pairs = 0
        self.seconds = 0.0
        self._t0: float | None = None

    @contextlib.contextmanager
    def measure(self, cells: int, pairs: int):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds += time.perf_counter() - t0
            self.cells += cells
            self.pairs += pairs

    @property
    def cells_per_sec(self) -> float:
        return self.cells / self.seconds if self.seconds else 0.0

    @property
    def pairs_per_sec(self) -> float:
        return self.pairs / self.seconds if self.seconds else 0.0

    def summary(self) -> dict:
        return {
            "cells": self.cells,
            "pairs": self.pairs,
            "seconds": round(self.seconds, 3),
            "cells_per_sec": round(self.cells_per_sec, 0),
            "pairs_per_sec": round(self.pairs_per_sec, 2),
        }
