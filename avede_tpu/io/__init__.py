"""Host-side I/O: video decode/sampling, clip cutting, embedding cache."""

from .video_reader import VideoReader, VideoMeta  # noqa: F401
from .clip_writer import ClipWriter  # noqa: F401
from .embedding_cache import EmbeddingCache  # noqa: F401
