"""Model zoo — real Flax architectures with torch→JAX weight converters.

Every model the reference wraps (SURVEY.md §2.1) exists here as an
actual JAX implementation: CLIP ViT-B/32 (image+text), BLIP captioner,
UniVTG-style temporal grounding (real, replacing the reference's mock),
YOLOv8 detector, OWL-ViT open-vocabulary detector, and a conv feature
extractor for object re-ID. Weights load from converted checkpoints via
``convert.py``; with no checkpoint available, deterministic random
initialisation is used (the environment ships no pretrained weights).
"""
