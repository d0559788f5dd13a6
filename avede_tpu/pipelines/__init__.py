"""Query pipelines (the reference's ``src/pipeline/`` layer,
SURVEY.md §2.2), re-built over the shared embedding engine: phase 1
(scan), phase 2 (caption rerank), phase 3 (temporal grounding), phase 4
/ image matching — each a thin orchestrator over device-resident frame
embeddings computed once per video.
"""

from .phase1 import Phase1Scan  # noqa: F401
