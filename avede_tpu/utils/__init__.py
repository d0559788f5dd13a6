"""Cross-cutting utilities: config, logging, errors, metrics, registry."""

from .config import settings  # noqa: F401
from .logging import get_logger  # noqa: F401
