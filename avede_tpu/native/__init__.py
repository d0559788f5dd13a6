"""Native C++ host-side kernels (ctypes; see build.py)."""

from .hostops import available, hamming_batch, nms, pairwise_iou, \
    phash_batch, temporal_dedup  # noqa: F401
