"""Tracing/profiling — the reference has only a wall-clock StopWatch
(SURVEY.md §5); here per-phase wall clock plus optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator

import jax

log = logging.getLogger(__name__)

_PHASES: Dict[str, float] = {}


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Accumulate wall-clock per named phase; read with phase_report()."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _PHASES[name] = _PHASES.get(name, 0.0) + time.perf_counter() - t0


def phase_report() -> Dict[str, float]:
    return dict(_PHASES)


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
