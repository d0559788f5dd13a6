"""Error taxonomy, degradation decorators, and a structured error log.

Role model: reference ``src/utils/error_handler.py`` — a typed exception
hierarchy with error codes, decorators that degrade gracefully
(None/empty on failure), and a JSON error log with severity routing and
health statistics. Rebuilt without the recovery-action indirection the
reference never exercises; severity routing and stats are kept because
the API health endpoint reports them.
"""

from __future__ import annotations

import functools
import json
import threading
import time
import traceback
from collections import deque
from pathlib import Path
from typing import Any, Callable, Deque, Dict, Optional

from .logging import get_logger

logger = get_logger(__name__)


class AvedeError(Exception):
    """Base framework error with a stable error code."""

    code = "AVEDE_ERROR"

    def __init__(self, message: str, **context: Any) -> None:
        super().__init__(message)
        self.context = context


class VideoValidationError(AvedeError):
    code = "VIDEO_VALIDATION"


class VideoDecodeError(AvedeError):
    code = "VIDEO_DECODE"


class ModelLoadError(AvedeError):
    code = "MODEL_LOAD"


class InferenceError(AvedeError):
    code = "INFERENCE"


class DetectionError(AvedeError):
    code = "DETECTION"


class MatchingError(AvedeError):
    code = "MATCHING"


class ClipExtractionError(AvedeError):
    code = "CLIP_EXTRACTION"


class ConfigurationError(AvedeError):
    code = "CONFIGURATION"


class ErrorLog:
    """Thread-safe rolling error log with severity stats (reference
    ``error_handler.py:100-257`` role)."""

    def __init__(self, path: Optional[str] = None, maxlen: int = 1000) -> None:
        self._lock = threading.Lock()
        self._entries: Deque[Dict[str, Any]] = deque(maxlen=maxlen)
        self._path = Path(path) if path else None

    def record(self, exc: BaseException, severity: str = "error",
               component: str = "unknown") -> None:
        entry = {
            "time": time.time(),
            "severity": severity,
            "component": component,
            "code": getattr(exc, "code", type(exc).__name__),
            "message": str(exc),
            "traceback": traceback.format_exc(limit=6),
        }
        with self._lock:
            self._entries.append(entry)
            if self._path is not None:
                try:
                    self._path.parent.mkdir(parents=True, exist_ok=True)
                    with self._path.open("a") as f:
                        f.write(json.dumps(entry) + "\n")
                except OSError:
                    pass
        log = logger.critical if severity == "critical" else (
            logger.error if severity == "error" else logger.warning)
        log("[%s] %s: %s", component, entry["code"], entry["message"])

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            entries = list(self._entries)
        by_code: Dict[str, int] = {}
        for e in entries:
            by_code[e["code"]] = by_code.get(e["code"], 0) + 1
        return {"total": len(entries), "by_code": by_code,
                "recent": entries[-5:]}

    def health(self) -> Dict[str, Any]:
        s = self.stats()
        return {"status": "degraded" if s["total"] > 0 else "healthy", **s}


error_log = ErrorLog()


def degrade(default: Any = None, severity: str = "error",
            component: Optional[str] = None,
            exceptions: tuple = (Exception,)) -> Callable:
    """Decorator: on failure, record the error and return ``default``.

    Replaces the reference's trio of near-identical decorators
    (``handle_model_loading_error`` → None, ``handle_inference_error`` → [],
    ``error_handler.py:13-37``) with one parameterised combinator.
    """

    def deco(fn: Callable) -> Callable:
        comp = component or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            try:
                return fn(*args, **kwargs)
            except exceptions as exc:  # noqa: BLE001 — deliberate degradation
                error_log.record(exc, severity=severity, component=comp)
                return default() if callable(default) else default

        return wrapper

    return deco


def error_envelope(task_id: str, exc: BaseException) -> Dict[str, Any]:
    """Typed error envelope for API responses (reference
    ``video_processor.py:765-815`` role, minus Windows paging heuristics)."""
    return {
        "task_id": task_id,
        "status": "error",
        "error_code": getattr(exc, "code", type(exc).__name__),
        "error": str(exc),
        "results": [],
        "total_found": 0,
    }
