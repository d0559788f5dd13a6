"""Batching executor — coalesces concurrent requests into device batches.

The serving-runtime piece the reference has no analog for (its
concurrency is thread pools around single-image model calls). Under
load, many API requests each want a handful of crops/frames embedded;
dispatching them individually wastes the MXU. ``BatchingExecutor``
queues work items, and a dispatcher thread drains the queue every
``max_wait_ms`` (or as soon as ``max_batch`` items are pending),
concatenates the arrays, runs ONE batched device call, and scatters the
results back to the waiting futures.

Usage:
    ex = BatchingExecutor(engine.embed_frames, max_batch=256)
    fut = ex.submit(frames_a)        # from any thread
    emb_a = fut.result()
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Callable, List, Optional, Tuple

import numpy as np

from ..utils.logging import get_logger

logger = get_logger(__name__)


class BatchingExecutor:
    def __init__(self, batched_fn: Callable[[np.ndarray], np.ndarray],
                 max_batch: int = 256, max_wait_ms: float = 5.0) -> None:
        self._fn = batched_fn
        self._max_batch = max_batch
        self._max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue[Optional[Tuple[np.ndarray, Future]]]" = \
            queue.Queue()
        self._stats = {"batches": 0, "items": 0, "requests": 0}
        self._thread = threading.Thread(target=self._dispatch, daemon=True,
                                        name="avede-batcher")
        self._thread.start()

    def submit(self, items: np.ndarray) -> Future:
        """items: [n, ...] array; future resolves to the [n, D] result."""
        fut: Future = Future()
        self._q.put((np.asarray(items), fut))
        return fut

    def __call__(self, items: np.ndarray) -> np.ndarray:
        return self.submit(items).result()

    def close(self) -> None:
        self._q.put(None)
        self._thread.join(timeout=5)

    @property
    def stats(self) -> dict:
        return dict(self._stats)

    # ------------------------------------------------------------------
    def _dispatch(self) -> None:
        while True:
            first = self._q.get()
            if first is None:
                return
            pending: List[Tuple[np.ndarray, Future]] = [first]
            count = len(first[0])
            deadline = self._max_wait
            import time

            t0 = time.monotonic()
            while count < self._max_batch:
                remaining = deadline - (time.monotonic() - t0)
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._run(pending)
                    return
                pending.append(nxt)
                count += len(nxt[0])
            self._run(pending)

    def _run(self, pending: List[Tuple[np.ndarray, Future]]) -> None:
        try:
            batch = np.concatenate([items for items, _ in pending], axis=0)
            out = self._fn(batch)
            lo = 0
            for items, fut in pending:
                hi = lo + len(items)
                fut.set_result(out[lo:hi])
                lo = hi
            self._stats["batches"] += 1
            self._stats["items"] += len(batch)
            self._stats["requests"] += len(pending)
        except Exception as exc:  # noqa: BLE001 — deliver to waiters
            for _, fut in pending:
                if not fut.done():
                    fut.set_exception(exc)
