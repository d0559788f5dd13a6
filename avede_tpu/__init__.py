"""AVEDE-TPU: Advanced Video Event Detection & Extraction, TPU-native.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
nb-hmd/Advanced-Video-Event-Detection-Extraction (reference surveyed in
SURVEY.md): natural-language and reference-image queries over videos,
open-vocabulary detection, person re-identification, small-object
detection, temporal grounding, and clip extraction — designed TPU-first:

- every scoring stage is a jitted, batched program over device-resident
  frame tensors (the reference loops Python over one-image torch calls);
- frames are embedded ONCE per video and cached; all phases reuse them;
- parallelism is SPMD over a ``jax.sharding.Mesh`` (data-parallel frames,
  optional tensor-parallel model axis), not thread pools;
- preprocessing (resize/normalize/patchify) is fused into the encoders
  (algebraic folding + Pallas kernels), so raw uint8 frames go in and
  unit-norm embeddings come out.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (importing jax-heavy modules only when
    the symbol is actually used)."""
    if name == "VideoProcessor":
        from .services.video_processor import VideoProcessor

        return VideoProcessor
    if name == "ClipEngine":
        from .parallel.embed import ClipEngine

        return ClipEngine
    if name == "settings":
        from .utils.config import settings

        return settings
    if name == "create_app":
        from .api.app import create_app

        return create_app
    raise AttributeError(f"module 'avede_tpu' has no attribute {name!r}")
