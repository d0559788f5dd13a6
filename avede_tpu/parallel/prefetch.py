"""Async host→device prefetching.

SURVEY.md §7.3.5: video decode is host-bound; keeping chips fed needs
the next batch's transfer overlapped with the current batch's compute.
``prefetch_to_device`` wraps any host iterator with a background thread
that stages ``device_put`` ahead of consumption (double/triple
buffering) — the data-loader role the reference fills with thread pools
around model calls.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax

from ..utils.logging import get_logger

logger = get_logger(__name__)

_END = object()


def prefetch_to_device(iterator: Iterable, buffer_size: int = 2,
                       sharding: Optional[Any] = None,
                       transform: Optional[Callable] = None) -> Iterator:
    """Yield device-resident items; transfers run ahead on a thread.

    ``transform`` (host-side, e.g. decode/augment) runs on the worker
    thread; ``device_put`` targets ``sharding`` when given (e.g.
    ``MeshContext.data_sharded``).
    """
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    err: list = []

    def worker() -> None:
        try:
            for item in iterator:
                if transform is not None:
                    item = transform(item)
                item = (jax.device_put(item, sharding)
                        if sharding is not None else jax.device_put(item))
                q.put(item)
        except Exception as exc:  # noqa: BLE001 — re-raised on consumer
            err.append(exc)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True,
                         name="avede-prefetch")
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item


class FrameBatcher:
    """Host iterator: video → fixed-size uint8 frame batches (the
    decode side of the prefetch pipeline)."""

    def __init__(self, reader, video_path: str, batch: int,
                 sample_rate: Optional[int] = None) -> None:
        self.frames, self.timestamps = reader.extract_frames(
            video_path, sample_rate=sample_rate)
        self.batch = batch

    def __iter__(self):
        for lo in range(0, len(self.frames), self.batch):
            yield self.frames[lo: lo + self.batch]

    def __len__(self) -> int:
        return (len(self.frames) + self.batch - 1) // self.batch
