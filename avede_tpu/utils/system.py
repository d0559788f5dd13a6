"""Host-process tuning under decode load (SystemOptimizer role).

Role model: reference ``SystemOptimizer``
(``/root/reference/src/utils/system_optimizer.py``): aggressive GC
thresholds, process priority, env tuning, an RLIMIT_AS soft cap at 80%
of available, and a resource-monitor thread. The CUDA/torch pieces are
obsolete on TPU (XLA owns device memory), but the HOST side still
bites: video decode allocates large frame stacks, and a leaky request
storm can OOM the VM. This module keeps exactly those pieces:

- ``optimized_context()`` — GC thresholds tuned for large-array churn
  (+ optional niceness bump), restored on exit;
- an optional RLIMIT_AS guard — **off by default**: XLA reserves large
  virtual mappings at init, so an address-space cap is only safe in
  decode-only worker processes (the reference applies it blindly and
  would strangle any real accelerator runtime);
- ``ResourceMonitor`` — samples host memory pressure into the live
  metrics monitor (visible at ``/api/metrics``) and fires gc + a
  warning above the high-water mark.
"""

from __future__ import annotations

import contextlib
import gc
import threading
import time
from typing import Iterator, Optional

from .logging import get_logger
from .memory import snapshot
from .metrics import get_monitor

logger = get_logger(__name__)


@contextlib.contextmanager
def optimized_context(gc_thresholds=(700, 10, 10),
                      nice_delta: int = 0,
                      rlimit_fraction: Optional[float] = None
                      ) -> Iterator[None]:
    """Apply host tuning; restore prior state on exit.

    ``rlimit_fraction`` (e.g. 0.8) caps RLIMIT_AS at that fraction of
    currently-available memory — pass it ONLY in decode-only workers
    (see module docstring).
    """
    old_thresholds = gc.get_threshold()
    gc.set_threshold(*gc_thresholds)
    old_limit = None
    if nice_delta:
        try:
            import os

            os.nice(nice_delta)
        except OSError:
            logger.debug("nice(%d) not permitted", nice_delta)
    if rlimit_fraction:
        try:
            import resource

            soft, hard = resource.getrlimit(resource.RLIMIT_AS)
            avail = snapshot().available_mb * 1024 * 1024
            cap = int(avail * rlimit_fraction)
            resource.setrlimit(resource.RLIMIT_AS, (cap, hard))
            old_limit = (soft, hard)
            logger.info("RLIMIT_AS capped at %.1f GB", cap / 1024 ** 3)
        except Exception:  # noqa: BLE001 — guard is best-effort
            logger.warning("RLIMIT_AS cap failed; continuing without")
    try:
        yield
    finally:
        gc.set_threshold(*old_thresholds)
        if old_limit is not None:
            import resource

            with contextlib.suppress(Exception):
                resource.setrlimit(resource.RLIMIT_AS, old_limit)


class ResourceMonitor:
    """Background sampler: host memory pressure → metrics + gc above
    the high-water mark (reference ``system_optimizer.py:198-250``
    role, wired into the live monitor instead of a dead log)."""

    def __init__(self, interval_s: float = 5.0,
                 high_water: float = 0.9) -> None:
        self.interval = interval_s
        self.high_water = high_water
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "ResourceMonitor":
        if self._thread is not None:
            return self
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="avede-resource-monitor")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval + 1)
            self._thread = None

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            mem = snapshot()
            get_monitor().record("host_memory_pressure", mem.pressure)
            if mem.pressure >= self.high_water:
                logger.warning(
                    "Host memory pressure %.2f ≥ %.2f — forcing gc "
                    "(available %.0f MB)", mem.pressure, self.high_water,
                    mem.available_mb)
                gc.collect()
