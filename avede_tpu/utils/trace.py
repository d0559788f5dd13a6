"""Tracing / profiling hooks.

SURVEY.md §5: the reference has no tracer — only ad-hoc ``time.time()``
deltas. Here profiling is first-class:

- ``trace(label)`` — context manager wrapping work in a named
  ``jax.profiler.TraceAnnotation`` AND recording wall time into the
  live metrics monitor (so `/api/metrics` shows it);
- ``profile_to(dir)`` — captures a full XLA device profile
  (TensorBoard-compatible) around a block, enabled by
  ``AVEDE_PROFILE=/path`` for any CLI entry point.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

from .logging import get_logger
from .metrics import get_monitor

logger = get_logger(__name__)


@contextlib.contextmanager
def trace(label: str, **labels) -> Iterator[None]:
    import jax

    t0 = time.time()
    with jax.profiler.TraceAnnotation(label):
        yield
    get_monitor().record(label, time.time() - t0, **labels)


@contextlib.contextmanager
def profile_to(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture an XLA device profile when a directory is given (or via
    the ``AVEDE_PROFILE`` environment variable); no-op otherwise."""
    import jax

    log_dir = log_dir or os.environ.get("AVEDE_PROFILE")
    if not log_dir:
        yield
        return
    logger.info("Capturing device profile → %s", log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Profile written to %s", log_dir)
