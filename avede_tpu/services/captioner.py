"""Caption service: batched BLIP captioning + functional text similarity.

Role of the reference's ``BLIPModel`` wrapper
(``/root/reference/src/models/blip_model.py``) — but with two fixes by
design (SURVEY.md §2.6.9):

- the reference captions ONE image per ``generate`` call; here whole
  candidate batches decode together in a single jitted scan;
- the reference's ``compute_text_similarity`` always returns 0.0 (its
  sentence model is disabled), silently degenerating the phase-2 rerank;
  here caption↔query similarity is real — both texts go through the
  shared CLIP text encoder.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.blip import BlipCaptioner, BlipConfig, blip_base, init_blip
from ..models.convert import load_params
from ..models.tokenizer import HashCaptionDecoder, WordPieceTokenizer
from ..ops.preprocess import blip_preprocess
from ..parallel.embed import ClipEngine
from ..utils.config import settings
from ..utils.logging import get_logger

logger = get_logger(__name__)


def _params_identity(params) -> str:
    """Stable identity for explicitly-passed params: different weights
    must never share repr-cache entries. Digests every leaf's shape
    plus a byte sample from each (head + tail), so checkpoints that
    share one frozen leaf (e.g. an embedding table) but differ in
    fine-tuned later layers still get distinct tags — hashing only the
    first leaf could serve stale captions across such checkpoints."""
    import hashlib

    import jax

    h = hashlib.md5()
    for leaf in jax.tree_util.tree_leaves(params):
        a = np.ascontiguousarray(np.asarray(leaf))
        h.update(str(a.shape).encode())
        b = a.tobytes()
        h.update(b[:1024])
        h.update(b[-1024:])
    return "explicit:" + h.hexdigest()[:8]


def _wordpiece_for(vocab_path, model_vocab_size: int,
                   mode: str = "decode"):
    """Bundled (or explicit) WordPiece vocab, ONLY when its id space
    fits the model. ``decode`` requires the exact width (a 30524-entry
    vocab against a tiny 100-id test decoder would map every generated
    id to [PAD]/[unused] and silently blank all captions); ``encode``
    only requires every reachable id — real pieces, not bracketed
    specials that lowercased queries can never hit — to index inside
    the model's embedding table (the Q-Former's is 30523 wide)."""
    path = vocab_path or settings.BLIP_VOCAB
    if not (path and Path(path).exists()):
        return None
    tok = WordPieceTokenizer(path)
    if mode == "decode":
        ok = len(tok.inv) == model_vocab_size
    else:
        max_reachable = max(
            (i for w, i in tok.vocab.items()
             if not (w.startswith("[") and w.endswith("]"))),
            default=0)
        ok = max(max_reachable, tok.unk) < model_vocab_size
    if not ok:
        logger.info("WordPiece vocab %d doesn't fit model vocab %d "
                    "(%s) — using hash fallback", len(tok.inv),
                    model_vocab_size, mode)
        return None
    return tok


class CaptionService:
    def __init__(self, engine: ClipEngine,
                 cfg: Optional[BlipConfig] = None,
                 params: Optional[dict] = None,
                 weights_path: Optional[str] = None,
                 vocab_path: Optional[str] = None) -> None:
        self.engine = engine
        if cfg is None:
            from ..utils.platform import with_compute_dtype

            cfg = with_compute_dtype(blip_base())
        self.cfg = cfg
        weights_path = weights_path or settings.BLIP_WEIGHTS
        if params is not None:
            self.model = BlipCaptioner(self.cfg)
            self.params = params
            self._param_src = _params_identity(params)
        elif weights_path and Path(weights_path).exists():
            self.model = BlipCaptioner(self.cfg)
            self.params = load_params(weights_path)
            self._param_src = f"ckpt:{weights_path}"
            logger.info("BLIP weights loaded from %s", weights_path)
        else:
            self.model, self.params = init_blip(self.cfg, seed=0)
            self._param_src = "rand0"
            logger.info("BLIP randomly initialised (no checkpoint)")
        self.decoder = (_wordpiece_for(vocab_path, self.cfg.vocab_size)
                        or HashCaptionDecoder())
        self._gen_fns = {}

    def _gen_fn(self, n: int):
        # compiled per (input shape, num_beams, length_penalty): every
        # settings knob baked into the program must be part of the key,
        # or a runtime change would be silently ignored for shapes that
        # already compiled
        beams = max(1, int(settings.CAPTION_NUM_BEAMS))
        penalty = float(settings.CAPTION_LENGTH_PENALTY)
        key = (n, beams, penalty)
        if key not in self._gen_fns:
            model, size = self.model, self.cfg.image_size

            @jax.jit
            def run(params, frames_u8):
                px = blip_preprocess(frames_u8, size=size)
                if beams == 1:
                    return model.apply({"params": params}, px,
                                       method=model.generate)
                return model.apply({"params": params}, px, beams,
                                   length_penalty=penalty,
                                   method=model.generate_beam)

            self._gen_fns[key] = run
        return self._gen_fns[key]

    def caption_frames(self, frames: np.ndarray) -> List[str]:
        """uint8 [N, H, W, 3] → N caption strings (whole batch decodes in
        one scan program)."""
        if len(frames) == 0:
            return []
        ids = np.asarray(self._gen_fn(frames.shape[1:])(
            self.params, jnp.asarray(frames)))
        caps = []
        for row in ids:
            toks = []
            for t in row.tolist()[1:]:
                if t == self.cfg.eos_token_id or t == self.cfg.pad_token_id:
                    break
                toks.append(t)
            caps.append(self.decoder.decode(toks) or "image content")
        return caps

    def caption_query_similarity(self, captions: List[str],
                                 query: str) -> np.ndarray:
        """Cosine between caption and query in CLIP text space → [N]."""
        if not captions:
            return np.zeros((0,), np.float32)
        embs = self.engine.embed_texts(captions + [query])
        cap_e, q_e = embs[:-1], embs[-1]
        return (cap_e @ q_e).astype(np.float32)

    # Phase-2 reranker interface -----------------------------------------
    # frame_repr is the query-INDEPENDENT half (cacheable per frame by
    # io.embedding_cache.FrameReprCache); scores_from_repr is the cheap
    # query-dependent half.
    repr_kind = "blipcap"

    @property
    def repr_tag(self) -> str:
        c = self.cfg
        beams = max(1, int(settings.CAPTION_NUM_BEAMS))
        dec = (f"wp:{getattr(self.decoder, 'vocab_path', '')}"
               if isinstance(self.decoder, WordPieceTokenizer)
               else type(self.decoder).__name__)
        return (f"capv1|{c.image_size}px|{c.vision_depth}x{c.vision_dim}"
                f"|{c.text_depth}x{c.text_dim}|b{beams}"
                f"|p{float(settings.CAPTION_LENGTH_PENALTY):g}"
                f"|{dec}|{self._param_src}")

    def frame_repr(self, frames: np.ndarray) -> List[np.ndarray]:
        return [np.str_(c) for c in self.caption_frames(frames)]

    def scores_from_repr(self, reprs: List[np.ndarray], query: str
                         ) -> "tuple[np.ndarray, List[dict]]":
        caps = [str(r) for r in reprs]
        sims = self.caption_query_similarity(caps, query)
        return sims, [{"caption": c} for c in caps]

    def rerank_scores(self, frames: np.ndarray, query: str
                      ) -> "tuple[np.ndarray, List[dict]]":
        return self.scores_from_repr(self.frame_repr(frames), query)


class Blip2RerankService:
    """BLIP-2 Q-Former ITC reranker (BASELINE config
    "phase2_reranker: BLIP-2 Q-Former rerank"). Scores candidate frames
    against the query directly via image-text contrastive similarity —
    no caption round-trip. Selected when ``settings.BLIP_MODEL``
    contains "blip2" (reference ``blip_model.py:184-197`` class choice)."""

    def __init__(self, cfg=None, params: Optional[dict] = None,
                 weights_path: Optional[str] = None,
                 tokenizer=None) -> None:
        from ..models.qformer import (Blip2Retrieval, QFormerConfig,
                                      init_blip2)
        from ..models.tokenizer import HashTokenizer, WordPieceTokenizer

        if cfg is None:
            from ..utils.platform import with_compute_dtype

            cfg = with_compute_dtype(QFormerConfig())
        self.cfg = cfg
        weights_path = weights_path or settings.BLIP_WEIGHTS
        if params is not None:
            self.model = Blip2Retrieval(self.cfg)
            self.params = params
            self._param_src = _params_identity(params)
        elif weights_path and Path(weights_path).exists():
            self.model = Blip2Retrieval(self.cfg)
            self.params = load_params(weights_path)
            self._param_src = f"ckpt:{weights_path}"
            logger.info("BLIP-2 weights loaded from %s", weights_path)
        else:
            self.model, self.params = init_blip2(self.cfg, seed=0)
            self._param_src = "rand0"
            logger.info("BLIP-2 Q-Former randomly initialised")
        self.tokenizer = (tokenizer
                          or _wordpiece_for(None, self.cfg.vocab_size,
                                            mode="encode")
                          or HashTokenizer(self.cfg.vocab_size))
        self._fns = {}

    def rerank_scores(self, frames: np.ndarray, query: str
                      ) -> "tuple[np.ndarray, List[dict]]":
        return self.scores_from_repr(self.frame_repr(frames), query)

    # query-independent / query-dependent split (see CaptionService)
    repr_kind = "blip2img"

    @property
    def repr_tag(self) -> str:
        c = self.cfg
        return (f"itcv1|{c.image_size}px|{c.vision_depth}x{c.vision_dim}"
                f"|{c.num_query_tokens}q|{c.projection_dim}d"
                f"|{c.hidden}h|{c.depth}L|{self._param_src}")

    def frame_repr(self, frames: np.ndarray) -> List[np.ndarray]:
        """→ per-frame normalized Q-Former image embeddings [Q, D]."""
        if len(frames) == 0:
            return []
        shape = frames.shape[1:]
        if ("img", shape) not in self._fns:
            model, size = self.model, self.cfg.image_size

            @jax.jit
            def run(params, frames_u8):
                px = blip_preprocess(frames_u8, size=size)
                return model.apply({"params": params}, px,
                                   method=model.image_embeds)

            self._fns[("img", shape)] = run
        img = np.asarray(self._fns[("img", shape)](
            self.params, jnp.asarray(frames)), np.float32)
        return [row for row in img]

    def scores_from_repr(self, reprs: List[np.ndarray], query: str
                         ) -> "tuple[np.ndarray, List[dict]]":
        if not reprs:
            return np.zeros((0,), np.float32), []
        ids_list = self.tokenizer.encode(query)[:30]
        ids = np.asarray([[101] + ids_list + [102]], np.int32)  # CLS/SEP
        mask = np.ones_like(ids, bool)
        if "txt" not in self._fns:
            model = self.model

            @jax.jit
            def run(params, ids, mask):
                return model.apply({"params": params}, ids, mask,
                                   method=model.text_embeds)

            self._fns["txt"] = run
        txt = np.asarray(self._fns["txt"](
            self.params, jnp.asarray(ids), jnp.asarray(mask)),
            np.float32)[0]                                # [D]
        img = np.stack([np.asarray(r, np.float32) for r in reprs])
        scores = (img @ txt).max(axis=1).astype(np.float32)  # max over Q
        return scores, [{"itc_score": float(s)} for s in scores]


def make_reranker(engine: ClipEngine):
    """Pick the phase-2 reranker by config (BLIP vs BLIP-2)."""
    if "blip2" in settings.BLIP_MODEL.lower():
        return Blip2RerankService()
    return CaptionService(engine)
