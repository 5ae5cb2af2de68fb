"""Leaf utilities: timers, progress, logging setup."""

from pose3d_tpu.utils.timing import StopWatch, loadbar  # noqa: F401
