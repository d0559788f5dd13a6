"""Request models (pydantic v2) — field-for-field the reference's
(``/root/reference/src/api/main.py:26-122``)."""

from __future__ import annotations

from typing import List, Optional, Union

from pydantic import BaseModel


class QueryRequest(BaseModel):
    video_id: str
    query: str
    mode: str = "mvp"
    top_k: Optional[int] = None
    threshold: Optional[float] = None


class ImageMatchingRequest(BaseModel):
    video_id: str
    matching_mode: str = "traditional"
    target_class: Optional[str] = None
    top_k: Optional[int] = None
    similarity_threshold: Optional[float] = None
    debug_mode: bool = False


class UnlimitedDetectionRequest(BaseModel):
    video_id: str
    object_queries: Union[str, List[str]]
    detection_mode: str = "hybrid"
    matching_precision: str = "balanced"
    top_k: Optional[int] = 10
    confidence_threshold: Optional[float] = 0.3
    debug_mode: bool = False


class SmallObjectDetectionRequest(BaseModel):
    video_id: str
    object_queries: Union[str, List[str]]
    enable_background_independence: bool = True
    enable_adaptive_thresholds: bool = True
    enable_rpn: bool = True
    min_object_size: Optional[int] = 16
    max_object_size: Optional[int] = 128
    confidence_threshold: Optional[float] = 0.2
    top_k: Optional[int] = 20
    detection_mode: str = "clip"       # clip | owlvit | yolo_enhanced | hybrid
    debug_mode: bool = False


class BackgroundIndependenceRequest(BaseModel):
    video_id: str
    object_queries: Union[str, List[str]]
    background_removal_strength: float = 0.8
    contrastive_learning_enabled: bool = True
    shape_descriptor_enabled: bool = True
    confidence_threshold: Optional[float] = 0.3
    top_k: Optional[int] = 15
    debug_mode: bool = False


class PersonSearchRequest(BaseModel):
    video_id: str
    image_id: str
    similarity_threshold: Optional[float] = None
    frame_skip: Optional[int] = None
    temporal_consistency: bool = True
    save_annotated_frames: bool = False
