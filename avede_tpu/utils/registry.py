"""Model registry — lazy loading, usage stats, eviction.

Role model: reference ``ModelCache`` (``/root/reference/src/utils/
model_cache.py``: two-tier pickle cache with config-hash validation,
TTL, LRU eviction) and ``ProgressiveModelLoader``
(``progressive_loader.py``: priority/dependency-ordered loading with
memory gating). On TPU most of that machinery is obsolete — XLA owns
device memory and params live in HBM — so the rebuild keeps what still
matters: one process-wide place that owns named model instances, loads
them lazily in priority order, tracks usage, and can evict host-side
copies under memory pressure. Persistent weights use ``models/convert``
.npz files (config-tagged), replacing the pickle tier.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, Dict, List, Optional

from .logging import get_logger

logger = get_logger(__name__)


class ModelRegistry:
    def __init__(self) -> None:
        self._lock = threading.RLock()
        self._loaders: Dict[str, Callable[[], Any]] = {}
        self._priority: Dict[str, int] = {}
        self._deps: Dict[str, List[str]] = {}
        self._instances: Dict[str, Any] = {}
        self._stats: Dict[str, Dict[str, float]] = {}

    def register(self, name: str, loader: Callable[[], Any],
                 priority: int = 5,
                 depends_on: Optional[List[str]] = None) -> None:
        with self._lock:
            self._loaders[name] = loader
            self._priority[name] = priority
            self._deps[name] = list(depends_on or [])

    def get(self, name: str) -> Any:
        with self._lock:
            if name in self._instances:
                self._stats[name]["uses"] += 1
                self._stats[name]["last_used"] = time.time()
                return self._instances[name]
            if name not in self._loaders:
                raise KeyError(f"model '{name}' not registered "
                               f"(known: {sorted(self._loaders)})")
            for dep in self._deps[name]:
                self.get(dep)
            t0 = time.time()
            logger.info("Loading model '%s'...", name)
            inst = self._loaders[name]()
            self._instances[name] = inst
            self._stats[name] = {"uses": 1, "last_used": time.time(),
                                 "load_seconds": time.time() - t0}
            return inst

    def load_all(self) -> List[str]:
        """Priority-ordered eager load (ProgressiveLoader role); returns
        names in load order. Dependency cycles raise."""
        order = self._topo_order()
        for name in order:
            self.get(name)
        return order

    def _topo_order(self) -> List[str]:
        with self._lock:
            names = sorted(self._loaders,
                           key=lambda n: (self._priority[n], n))
            out: List[str] = []
            seen: Dict[str, int] = {}

            def visit(n: str) -> None:
                state = seen.get(n, 0)
                if state == 1:
                    raise ValueError(f"dependency cycle at '{n}'")
                if state == 2:
                    return
                seen[n] = 1
                for d in self._deps.get(n, []):
                    visit(d)
                seen[n] = 2
                out.append(n)

            for n in names:
                visit(n)
            return out

    def evict(self, name: str) -> bool:
        with self._lock:
            if name in self._instances:
                del self._instances[name]
                logger.info("Evicted model '%s'", name)
                return True
            return False

    def evict_lru(self, keep: int = 2) -> List[str]:
        """Drop least-recently-used instances beyond ``keep``."""
        with self._lock:
            loaded = sorted(self._instances,
                            key=lambda n: self._stats[n]["last_used"],
                            reverse=True)
            victims = loaded[keep:]
            for v in victims:
                del self._instances[v]
            if victims:
                logger.info("LRU-evicted: %s", victims)
            return victims

    def status(self) -> Dict[str, Any]:
        with self._lock:
            return {
                "registered": sorted(self._loaders),
                "loaded": sorted(self._instances),
                "stats": {k: dict(v) for k, v in self._stats.items()},
            }


registry = ModelRegistry()
