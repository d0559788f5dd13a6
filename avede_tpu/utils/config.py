"""Framework configuration.

Role model: the reference's pydantic ``Settings``
(``/root/reference/src/utils/config.py:5-213``) — a single typed settings
object with ``.env``/environment overrides covering paths, video limits,
frame geometry, model identifiers, matching thresholds, and the
small-object configuration block. Re-designed here on pydantic v2
``BaseModel`` + explicit environment loading (pydantic-settings is not a
dependency), with TPU-specific additions (mesh axes, bucketing, dtypes)
replacing the reference's CUDA/memory-manager knobs.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, List, Optional

from pydantic import BaseModel, Field


def _bundled_asset(name: str) -> Optional[str]:
    """Absolute path of a packaged asset, or None if not shipped."""
    p = Path(__file__).resolve().parent.parent / "assets" / name
    return str(p) if p.exists() else None


class Settings(BaseModel):
    """All framework knobs. Every field can be overridden by an environment
    variable of the same (upper-case) name; lists/dicts parse as JSON."""

    # --- Paths (layout mirrors reference data/ tree) ---
    DATA_DIR: str = "data"
    XLA_CACHE_DIR: str = "data/xla_cache"   # persistent compiled-program
    # cache: server restarts skip the minutes-long startup compile storm
    # (147-324 s measured for the advanced pipeline); "" disables
    VIDEO_DIR: str = "data/videos"
    CLIP_DIR: str = "data/clips"
    FRAME_DIR: str = "data/frames"
    EMBEDDING_DIR: str = "data/embeddings"
    IMAGE_DIR: str = "data/images"
    LOG_DIR: str = "logs"

    # --- Video limits (reference config.py:12-16) ---
    MAX_VIDEO_SIZE_GB: float = 2.0
    SUPPORTED_FORMATS: List[str] = Field(
        default_factory=lambda: ["mp4", "avi", "mov", "mkv", "webm"]
    )
    FRAME_SAMPLE_RATE: int = 1          # sample every Nth frame
    MAX_FRAMES: int = 1000              # hard cap, evenly redistributed
    FRAME_MAX_SIZE: int = 512           # pre-resize long side cap

    # --- Sliding windows (reference config.py:15-16) ---
    WINDOW_SIZE: int = 16
    WINDOW_STRIDE: int = 8

    # --- Model identifiers ---
    CLIP_MODEL: str = "ViT-B-32"
    CLIP_PRETRAINED: str = "openai"
    CLIP_WEIGHTS: Optional[str] = None      # path to converted .npz / torch ckpt
    BLIP_MODEL: str = "blip-base"
    BLIP_WEIGHTS: Optional[str] = None
    CAPTION_NUM_BEAMS: int = 1              # 1 = greedy; >1 = beam search
    CAPTION_LENGTH_PENALTY: float = 1.0
    UNIVTG_WEIGHTS: Optional[str] = None
    YOLO_MODEL_SIZE: str = "n"
    YOLO_WEIGHTS: Optional[str] = None
    OWLVIT_MODEL: str = "owlvit-base-patch32"
    OWLVIT_WEIGHTS: Optional[str] = None
    FEATURE_EXTRACTOR_WEIGHTS: Optional[str] = None
    # bundled tokenizer data (tools/build_tokenizer_assets.py builds
    # both from local English text) — real BPE/WordPiece by default,
    # hash tokenizer only as explicit fallback (set to "" to force it)
    TOKENIZER_VOCAB: Optional[str] = Field(
        default_factory=lambda: _bundled_asset("clip_bpe_merges.txt.gz")
    )   # CLIP BPE merges file (bpe_simple_vocab_16e6 format)
    BLIP_VOCAB: Optional[str] = Field(
        default_factory=lambda: _bundled_asset(
            "blip_wordpiece_vocab.txt.gz")
    )   # BERT-layout WordPiece vocab for the BLIP text side
    FACE_MODEL_PATH: Optional[str] = None   # cv2 FaceDetectorYN onnx (optional)
    APPEARANCE_WEIGHTS: Optional[str] = None  # trained re-ID encoder .npz
    FACE_DETECTOR_WEIGHTS: Optional[str] = None  # trained face-region
    # tiny-YOLO .npz (FaceDetectorYN alternative — no ONNX required)
    FACE_EMBED_WEIGHTS: Optional[str] = None  # trained face embedding
    # .npz (AppearanceEncoder at 32 px face crops)

    # --- Inference knobs (reference config.py:37-40) ---
    BATCH_SIZE: int = 32
    BATCHING_EXECUTOR_ENABLED: bool = True  # coalesce concurrent crop embeds
    BATCHING_MAX_WAIT_MS: float = 4.0
    STREAM_CHUNK_FRAMES: int = 256          # decode→embed overlap chunk
    SCAN_TRANSFER: str = "i420"   # frame-scan host→device codec:
    # "i420" packs frames at model geometry as full-range BT.601 4:2:0
    # (5.9× fewer bytes than 512×288 RGB; embedding cosine vs the full
    # device path ≥0.9998 on decoded video, which is 4:2:0 at the
    # source — measured ops/preprocess.py); "rgb" = host crop+resize
    # only (2.9×, ≥0.9999); "full" ships raw frames (exact device
    # path). On a bandwidth-limited host↔device link the cold scan is
    # transfer-bound, so this codec IS the cold-path latency knob.
    SCAN_FUSED_PACK: bool = True  # run the i420 pack ON the decode
    # threads (N-way parallel, decoder-native BGR absorbed by the pack
    # matrix — byte-identical output) instead of serialized on the
    # prefetch thread; retention stores BGR and converts the K rerank
    # candidates back to RGB on lookup. Off = round-3 behavior.
    SCAN_SPARSE_COLD: bool = True  # cold MVP scan embeds ONLY window-
    # middle frames (the only rows phase-1 scoring ever reads —
    # ops/windows.py): ~8× less host→device transfer AND ~8× less ViT
    # work on the latency path. The cached table is stored sparse
    # (valid-row mask); full-table consumers (phase-3 grounding,
    # library ingest, multi-image matching) complete the missing rows
    # lazily from scan retention — no second decode. Requires the
    # fused i420 pack path; dense scan otherwise. Off = embed every
    # sampled frame on the cold path (round-3 behavior).
    TEXT_EMBED_CACHE: int = 512   # LRU entries; 0 disables
    EMBEDDING_MEM_CACHE_MB: int = 256   # in-memory table tier; 0 disables
    EMBEDDING_CACHE_INT8: bool = True   # per-row int8 cache entries
    # (4× smaller library storage, ≲1e-3 cosine error; ops/quant.py)
    LIBRARY_INDEX_DTYPE: str = "bfloat16"  # device-resident search table
    # (2× capacity vs float32 at ≤1e-3 score drift; "int8" = per-row
    # int8+scales, 4× capacity at the disk-cache drift budget;
    # library_index.py)
    LIBRARY_INDEX_DEDUP: bool = True    # collapse identical consecutive
    # rows at add time — lossless (the scan's FrameDeduper scatter
    # repeats the exact embedding per duplicate frame), so static
    # surveillance footage stores one row per run instead of per frame
    LIBRARY_PREWARM: bool = False   # serving startup embeds + indexes
    # the existing video library on a background thread so the first
    # /api/search-library is warm (off by default: tests and one-shot
    # CLIs shouldn't spin a thread that touches every video)
    LIBRARY_INDEX_ENABLED: bool = True  # device index behind
    # /api/search-library (falls back to per-table host scoring when
    # off or when a video_ids subset is requested)
    SCAN_DEDUP_EPS: float = 1.5   # near-duplicate frame gate (mean abs
    # diff, gray levels at 16×16); 0 disables — dup frames reuse their
    # run representative's embedding instead of re-running the ViT
    DECODE_WORKERS: int = 0                 # parallel segment decode threads
    # (0 = auto: min(4, cpu_count); measured on this 1-core dev box
    # threading loses — ffmpeg contends with itself — while TPU-VM
    # hosts have 100+ cores where spans scale near-linearly)
    FRAME_RETAIN_MB: int = 512    # scan-decoded frames kept (by
    # reference, zero-copy) for the same request's phase-2 rerank —
    # the cold advanced path reads NO frames twice. 0 disables;
    # over-budget videos fall back to container seeks. 512 MB holds
    # ~2000 frames at 512×288.
    TOP_K_RESULTS: int = 15
    CONFIDENCE_THRESHOLD: float = 0.25
    CLIP_DURATION: float = 30.0             # seconds per extracted clip
    MAX_WINDOWS_PER_BATCH: int = 32

    # --- Image matching (reference config.py:43-44,192-196) ---
    MATCHING_MODES: List[str] = Field(
        default_factory=lambda: [
            "traditional", "object_focused", "cross_domain", "hybrid",
            "smart_match", "fast_match",
        ]
    )
    MATCHING_THRESHOLDS: Dict[str, float] = Field(
        default_factory=lambda: {
            "traditional": 0.70,
            "object_focused": 0.60,
            "cross_domain": 0.50,
            "hybrid": 0.60,
            "smart_match": 0.55,
            "fast_match": 0.75,
        }
    )

    # --- Open-vocabulary detection ---
    DETECTION_MODES: List[str] = Field(
        default_factory=lambda: ["hybrid", "owlvit", "clip", "yolo_enhanced"]
    )
    MATCHING_PRECISIONS: Dict[str, float] = Field(
        default_factory=lambda: {
            "precise": 0.45,
            "balanced": 0.30,
            "comprehensive": 0.18,
            "semantic": 0.25,
            "visual": 0.25,
        }
    )
    DETECTION_MAX_OBJECTS: int = 100
    DETECTION_IOU_THRESHOLD: float = 0.45
    CLIP_GRID_SIZE: int = 8                 # CLIP sliding-grid detector cells/side

    # --- Small-object detection (reference config.py:79-187) ---
    SMALL_OBJECT_SIZES: Dict[str, List[int]] = Field(
        default_factory=lambda: {
            # category: [min_area_px, max_area_px] at native resolution
            "tiny": [0, 16 * 16],
            "small": [16 * 16, 32 * 32],
            "medium": [32 * 32, 96 * 96],
            "large": [96 * 96, 10 ** 9],
        }
    )
    SMALL_OBJECT_BASE_THRESHOLDS: Dict[str, float] = Field(
        default_factory=lambda: {"tiny": 0.05, "small": 0.10, "medium": 0.25, "large": 0.40}
    )
    SMALL_OBJECT_BOOSTS: Dict[str, float] = Field(
        default_factory=lambda: {"tiny": 2.0, "small": 1.5, "medium": 1.0, "large": 1.0}
    )
    MULTI_SCALE_WEIGHTS: Dict[str, float] = Field(
        default_factory=lambda: {"256": 1.2, "512": 1.0, "1024": 0.8}
    )
    TILE_SIZE: int = 640
    TILE_OVERLAP: int = 128
    RPN_MAX_PROPOSALS: int = 128

    # --- Person re-identification ---
    PERSON_SIMILARITY_THRESHOLD: float = 0.60
    PERSON_FRAME_SKIP: int = 5
    PERSON_BATCH_SIZE: int = 50
    PERSON_TEMPORAL_WINDOW: int = 5
    PERSON_TEMPORAL_KEEP_RATIO: float = 0.8
    PERSON_FEATURE_WEIGHTS: Dict[str, float] = Field(
        default_factory=lambda: {"face": 0.6, "body": 0.3, "visual": 0.1}
    )

    # --- TPU execution ---
    MESH_SHAPE: Optional[List[int]] = None   # None → (n_devices,) 1-D data mesh
    MESH_AXES: List[str] = Field(default_factory=lambda: ["data", "model"])
    COMPUTE_DTYPE: str = "bfloat16"
    PARAM_DTYPE: str = "float32"
    FRAME_BUCKETS: List[int] = Field(
        default_factory=lambda: [32, 64, 128, 256, 512, 1024]
    )
    EMBED_BATCH_PER_DEVICE: int = 128
    # Pallas patch-embed path: measured on TPU v5e (256×288×512 uint8,
    # ViT-B/32): XLA conv path 4617 fps vs Pallas matmul path 4257 fps —
    # XLA's conv+normalize fusion already wins, so the default is off.
    # The kernel (ops/pallas_kernels.py) stays available and tested.
    USE_PALLAS: bool = False
    DECODE_MAX_TOKENS: int = 50              # BLIP caption max length (reference blip_model.py:344)

    # --- Embedding cache (new artifact; format in io/embedding_cache.py) ---
    EMBEDDING_CACHE_ENABLED: bool = True
    EMBEDDING_CACHE_VERSION: int = 1

    # --- API ---
    API_HOST: str = "0.0.0.0"
    API_PORT: int = 8000
    WEB_PORT: int = 8501
    CORS_ORIGINS: List[str] = Field(default_factory=lambda: ["*"])

    # --- Observability ---
    LOG_LEVEL: str = "INFO"
    METRICS_ENABLED: bool = True
    ALARM_PROC_SECONDS: float = 10.0
    ALARM_MEM_MB: float = 4096.0
    ALARM_CPU_PCT: float = 90.0

    def ensure_dirs(self) -> None:
        for d in (self.DATA_DIR, self.VIDEO_DIR, self.CLIP_DIR, self.FRAME_DIR,
                  self.EMBEDDING_DIR, self.IMAGE_DIR, self.LOG_DIR):
            Path(d).mkdir(parents=True, exist_ok=True)

    @classmethod
    def from_env(cls, env: Optional[Dict[str, str]] = None) -> "Settings":
        env = dict(os.environ if env is None else env)
        overrides: Dict[str, Any] = {}
        for name, field in cls.model_fields.items():
            if name not in env:
                continue
            raw = env[name]
            ann = field.annotation
            try:
                if ann in (int, float, bool, Optional[int], Optional[float]):
                    overrides[name] = json.loads(raw.lower() if raw in ("True", "False") else raw)
                elif ann in (str, Optional[str]):
                    overrides[name] = raw
                else:
                    overrides[name] = json.loads(raw)
            except (json.JSONDecodeError, ValueError):
                overrides[name] = raw
        return cls(**overrides)


settings = Settings.from_env()
