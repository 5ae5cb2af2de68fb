"""Timing/progress helpers (reference include/helper.h:24-48).

``StopWatch`` stamps the TSV log rows; ``loadbar`` is the console progress
bar used by the host dataset loaders.  ``jax.profiler`` hooks cover the
on-device side (utils/profiling.py).
"""

from __future__ import annotations

import sys
import time


class StopWatch:
    """Wall-clock stopwatch with restart, like the reference helper."""

    def __init__(self):
        self.restart()

    def restart(self) -> None:
        self._t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def __enter__(self):
        self.restart()
        return self

    def __exit__(self, *exc):
        return False


def loadbar(label: str, i: int, total: int, width: int = 40,
            stream=sys.stderr) -> None:
    """Console progress bar; prints every call, terminates at i == total."""
    total = max(total, 1)
    frac = min(max(i / total, 0.0), 1.0)
    fill = int(width * frac)
    bar = "#" * fill + "-" * (width - fill)
    end = "\n" if i >= total else "\r"
    stream.write(f"{label}[{bar}] {int(100 * frac):3d}%{end}")
    stream.flush()
