"""BLIP image-captioning model (vision ViT + BERT-style cross-attention
text decoder) in Flax, with TPU-native greedy decoding.

Re-implements the model behind the reference's ``BLIPModel`` wrapper
(``/root/reference/src/models/blip_model.py``; default checkpoint
``Salesforce/blip-image-captioning-base``, ``config.py:27``). Numerics
match HF ``BlipForConditionalGeneration`` so converted torch checkpoints
reproduce reference captions (validated in tests/test_blip_parity.py).

TPU-native decode: the reference calls ``model.generate(max_length=50)``
— dynamic-length autoregressive decode on GPU (``blip_model.py:344``).
Here decoding is a ``lax.scan`` over a STATIC ``max_len`` with a KV
cache carried functionally, so the whole caption loop is one XLA
program; batches of candidate frames decode together (the reference
captions one frame per call).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BlipConfig:
    # vision tower
    image_size: int = 384
    patch_size: int = 16
    vision_dim: int = 768
    vision_depth: int = 12
    vision_heads: int = 12
    vision_mlp: int = 3072
    vision_ln_eps: float = 1e-5         # HF BlipVisionConfig default
    # text decoder (BERT-style, post-LN)
    vocab_size: int = 30524
    text_dim: int = 768
    text_depth: int = 12
    text_heads: int = 8                 # HF BlipTextConfig default is 8,
                                        # NOT 12 (full-geometry parity
                                        # caught this; single-key rows are
                                        # head-count invariant, so tiny
                                        # configs cannot)
    text_mlp: int = 3072
    max_pos: int = 512
    text_ln_eps: float = 1e-12
    bos_token_id: int = 30522           # [DEC]
    eos_token_id: int = 102             # [SEP]
    pad_token_id: int = 0
    max_caption_len: int = 50
    dtype: str = "float32"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def jnp_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype)


def blip_base() -> BlipConfig:
    return BlipConfig()


def tiny_blip_config() -> BlipConfig:
    return BlipConfig(image_size=32, patch_size=8, vision_dim=64,
                      vision_depth=2, vision_heads=4, vision_mlp=128,
                      vocab_size=100, text_dim=64, text_depth=2,
                      text_heads=4, text_mlp=128, max_pos=32,
                      bos_token_id=98, eos_token_id=99,
                      vision_ln_eps=1e-5, max_caption_len=12)


# ---------------------------------------------------------------------------
# vision tower (BLIP flavor: fused qkv, conv bias, no pre-LN)
# ---------------------------------------------------------------------------

class BlipVisionLayer(nn.Module):
    cfg: BlipConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.jnp_dtype
        d, h = cfg.vision_dim, cfg.vision_heads
        hd = d // h

        y = nn.LayerNorm(epsilon=cfg.vision_ln_eps, dtype=dt,
                         name="layer_norm1")(x)
        qkv = nn.Dense(3 * d, dtype=dt, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, hd)

        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32))
        a = jax.nn.softmax(s, axis=-1).astype(dt)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(
            x.shape[0], x.shape[1], d)
        x = x + nn.Dense(d, dtype=dt, name="projection")(o)

        y = nn.LayerNorm(epsilon=cfg.vision_ln_eps, dtype=dt,
                         name="layer_norm2")(x)
        y = nn.Dense(cfg.vision_mlp, dtype=dt, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=dt, name="fc2")(y)
        return x + y


class BlipVisionEncoder(nn.Module):
    """Pixels (ImageNet-ish BLIP normalization applied by caller) →
    patch-token hidden states [N, P+1, D]."""

    cfg: BlipConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.jnp_dtype
        x = nn.Conv(cfg.vision_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=dt, name="patch_embedding")(pixels.astype(dt))
        n = x.shape[0]
        x = x.reshape(n, cfg.num_patches, cfg.vision_dim)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.vision_dim,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (n, 1, cfg.vision_dim)), x],
            axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.num_patches + 1, cfg.vision_dim))
        x = x + pos.astype(dt)
        for i in range(cfg.vision_depth):
            x = BlipVisionLayer(cfg, name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=cfg.vision_ln_eps, dtype=dt,
                            name="post_layernorm")(x)


# ---------------------------------------------------------------------------
# text decoder (BERT post-LN with cross-attention)
# ---------------------------------------------------------------------------

class BertAttention(nn.Module):
    cfg: BlipConfig
    cross: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, kv: jax.Array,
                 mask: Optional[jax.Array],
                 kv_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
                 cache_index: Optional[jax.Array] = None):
        cfg = self.cfg
        dt = cfg.jnp_dtype
        d, h = cfg.text_dim, cfg.text_heads
        hd = d // h
        q = nn.Dense(d, dtype=dt, name="query")(x)
        k = nn.Dense(d, dtype=dt, name="key")(kv)
        v = nn.Dense(d, dtype=dt, name="value")(kv)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, hd)

        q, k, v = split(q), split(k), split(v)
        new_cache = None
        if kv_cache is not None:
            # decode step: write this step's k/v at cache_index, attend
            # over the cache
            ck, cv = kv_cache
            ck = jax.lax.dynamic_update_slice(ck, k, (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v, (0, cache_index, 0, 0))
            k, v = ck, cv
            new_cache = (ck, cv)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32))
        if mask is not None:
            s = jnp.where(mask, s, jnp.finfo(s.dtype).min)
        a = jax.nn.softmax(s, axis=-1).astype(dt)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(
            x.shape[0], x.shape[1], d)
        return o, new_cache


class BlipTextLayer(nn.Module):
    cfg: BlipConfig

    @nn.compact
    def __call__(self, x, vision, self_mask, cross_mask,
                 kv_cache=None, cache_index=None):
        cfg = self.cfg
        dt = cfg.jnp_dtype
        eps = cfg.text_ln_eps

        o, new_cache = BertAttention(cfg, name="self_attn")(
            x, x, self_mask, kv_cache, cache_index)
        o = nn.Dense(cfg.text_dim, dtype=dt, name="self_output")(o)
        x = nn.LayerNorm(epsilon=eps, dtype=dt, name="self_ln")(x + o)

        o, _ = BertAttention(cfg, cross=True, name="cross_attn")(
            x, vision, cross_mask)
        o = nn.Dense(cfg.text_dim, dtype=dt, name="cross_output")(o)
        x = nn.LayerNorm(epsilon=eps, dtype=dt, name="cross_ln")(x + o)

        y = nn.Dense(cfg.text_mlp, dtype=dt, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.text_dim, dtype=dt, name="output")(y)
        return nn.LayerNorm(epsilon=eps, dtype=dt, name="output_ln")(x + y), \
            new_cache


class BlipTextDecoder(nn.Module):
    cfg: BlipConfig

    @nn.compact
    def __call__(self, ids: jax.Array, vision: jax.Array,
                 position_offset: Optional[jax.Array] = None,
                 kv_caches=None, cache_index=None):
        """ids [B, L] → logits [B, L, V].

        With ``kv_caches`` (list of per-layer (k, v) buffers) the call is
        a single decode step: L == 1, positions offset by
        ``position_offset``, self-attention over the cache.
        """
        cfg = self.cfg
        dt = cfg.jnp_dtype
        B, L = ids.shape
        word = self.param("word_embeddings", nn.initializers.normal(0.02),
                          (cfg.vocab_size, cfg.text_dim))
        posm = self.param("position_embeddings",
                          nn.initializers.normal(0.02),
                          (cfg.max_pos, cfg.text_dim))
        x = jnp.take(word, ids, axis=0).astype(dt)
        if position_offset is None:
            x = x + posm[None, :L, :].astype(dt)
        else:
            pos = jax.lax.dynamic_slice(posm, (position_offset, 0),
                                        (L, cfg.text_dim))
            x = x + pos[None].astype(dt)
        x = nn.LayerNorm(epsilon=cfg.text_ln_eps, dtype=dt,
                         name="embed_ln")(x)

        if kv_caches is None:
            cmask = jnp.tril(jnp.ones((L, L), bool))[None, None]
            new_caches = None
            for i in range(cfg.text_depth):
                x, _ = BlipTextLayer(cfg, name=f"layers_{i}")(
                    x, vision, cmask, None)
        else:
            # decode step: attend to cache positions ≤ cache_index
            T = kv_caches[0][0].shape[1]
            pos_ids = jnp.arange(T)[None, None, None, :]
            smask = pos_ids <= cache_index
            new_caches = []
            for i in range(cfg.text_depth):
                x, cache = BlipTextLayer(cfg, name=f"layers_{i}")(
                    x, vision, smask, None, kv_caches[i], cache_index)
                new_caches.append(cache)

        # prediction head (HF cls.predictions)
        y = nn.Dense(cfg.text_dim, dtype=dt, name="transform")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.LayerNorm(epsilon=cfg.text_ln_eps, dtype=dt,
                         name="transform_ln")(y)
        logits = nn.Dense(cfg.vocab_size, dtype=dt, name="decoder")(y)
        return logits.astype(jnp.float32), new_caches


class BlipCaptioner(nn.Module):
    """Full captioning model with jittable greedy decode."""

    cfg: BlipConfig

    def setup(self) -> None:
        self.vision = BlipVisionEncoder(self.cfg)
        self.text = BlipTextDecoder(self.cfg)

    def __call__(self, pixels: jax.Array, ids: jax.Array) -> jax.Array:
        """Teacher-forced logits (used for parity tests / training)."""
        v = self.vision(pixels)
        logits, _ = self.text(ids, v)
        return logits

    def encode_vision(self, pixels: jax.Array) -> jax.Array:
        return self.vision(pixels)

    def generate(self, pixels: jax.Array,
                 max_len: Optional[int] = None) -> jax.Array:
        """Greedy caption ids [B, max_len] via ``lax.while_loop`` + KV
        cache. Output begins with BOS; positions after EOS are PAD.

        ``while_loop`` (not ``scan``): real captions end after ~10-15
        tokens, so the loop exits as soon as EVERY row has emitted EOS
        instead of always running ``max_len - 1`` decoder steps — same
        program, dynamic trip count, shapes static throughout. Exited
        iterations write nothing (rows are PAD-filled from init), so the
        result is bit-identical to the fixed-trip scan (covered by the
        beam==1 equivalence and HF parity tests).
        """
        cfg = self.cfg
        max_len = max_len or cfg.max_caption_len
        v = self.vision(pixels)
        B = pixels.shape[0]
        h = cfg.text_heads
        hd = cfg.text_dim // h

        caches = [(jnp.zeros((B, max_len, h, hd), cfg.jnp_dtype),
                   jnp.zeros((B, max_len, h, hd), cfg.jnp_dtype))
                  for _ in range(cfg.text_depth)]
        tokens0 = jnp.full((B, max_len), cfg.pad_token_id, jnp.int32)
        tokens0 = tokens0.at[:, 0].set(cfg.bos_token_id)

        def cond(carry):
            _, _, done, t = carry
            return (t < max_len - 1) & ~jnp.all(done)

        def body(carry):
            tokens, caches, done, t = carry
            cur = jax.lax.dynamic_slice(tokens, (0, t), (B, 1))
            logits, caches = self.text(cur, v, position_offset=t,
                                       kv_caches=caches, cache_index=t)
            nxt = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, cfg.pad_token_id, nxt)
            done = done | (nxt == cfg.eos_token_id)
            write = jnp.minimum(t + 1, max_len - 1)
            tokens = jax.lax.dynamic_update_slice(
                tokens, nxt[:, None], (0, write))
            return (tokens, caches, done, t + 1)

        done0 = jnp.zeros((B,), bool)
        tokens, _, _, _ = jax.lax.while_loop(
            cond, body, (tokens0, caches, done0, jnp.asarray(0)))
        return tokens

    def generate_beam(self, pixels: jax.Array, num_beams: int = 3,
                      max_len: Optional[int] = None,
                      length_penalty: float = 1.0) -> jax.Array:
        """Beam-search caption ids [B, max_len] — one XLA program.

        The reference's captioner delegates decoding to HF
        ``model.generate`` (``blip_model.py:351``), which carries beam
        search; this is the TPU-native equivalent: static shapes
        throughout, a ``lax.scan`` over decode steps, per-layer KV
        caches reordered by beam with one gather per step. Beams that
        emit EOS are BANKED into a per-batch top-K buffer of finished
        hypotheses ranked by ``score / len**length_penalty`` (HF's
        ``BeamHypotheses`` role) and their live slot dies — a finished
        hypothesis can never be evicted by later, lower-normalized live
        beams, matching HF ``generate(num_beams=K)``. The winner is the
        best normalized hypothesis across the bank and any still-live
        beams. ``num_beams=1`` reduces to greedy (tested equivalent).
        """
        cfg = self.cfg
        K = num_beams
        max_len = max_len or cfg.max_caption_len
        B = pixels.shape[0]
        h = cfg.text_heads
        hd = cfg.text_dim // h

        v = self.vision(pixels)                       # [B, P, D]
        vK = jnp.repeat(v, K, axis=0)                 # [B·K, P, D]

        caches = [(jnp.zeros((B * K, max_len, h, hd), cfg.jnp_dtype),
                   jnp.zeros((B * K, max_len, h, hd), cfg.jnp_dtype))
                  for _ in range(cfg.text_depth)]
        tokens0 = jnp.full((B, K, max_len), cfg.pad_token_id, jnp.int32)
        tokens0 = tokens0.at[:, :, 0].set(cfg.bos_token_id)
        # only beam 0 live at t=0 — all beams share the BOS prefix, so
        # seeding the rest at -inf avoids K duplicates of the same path
        scores0 = jnp.full((B, K), -jnp.inf, jnp.float32).at[:, 0].set(0.0)
        lens0 = jnp.zeros((B, K), jnp.int32)          # generated tokens
        bank_tokens0 = jnp.full((B, K, max_len), cfg.pad_token_id,
                                jnp.int32)
        bank_norm0 = jnp.full((B, K), -jnp.inf, jnp.float32)

        batch_off = (jnp.arange(B) * K)[:, None]      # [B, 1]

        def step(carry, t):
            tokens, caches, scores, lens, bank_tokens, bank_norm = carry
            cur = jax.lax.dynamic_slice(
                tokens, (0, 0, t), (B, K, 1)).reshape(B * K, 1)
            logits, caches = self.text(cur, vK, position_offset=t,
                                       kv_caches=caches, cache_index=t)
            logp = jax.nn.log_softmax(logits[:, 0, :])        # [B·K, V]
            V = logp.shape[-1]
            logp = logp.reshape(B, K, V)
            # dead slots (banked or never-seeded) carry score -inf and
            # contribute no candidates. Take a 2K candidate pool (HF's
            # beam width): up to K candidates may be EOS and go to the
            # bank, and K full continuations must still advance.
            K2 = min(2 * K, K * V)
            cand = scores[..., None] + logp                    # [B, K, V]
            cand2, flat2 = jax.lax.top_k(
                cand.reshape(B, K * V), K2)                    # [B, 2K]
            src2 = flat2 // V                                  # [B, 2K]
            tok2 = (flat2 % V).astype(jnp.int32)               # [B, 2K]
            is_eos2 = tok2 == cfg.eos_token_id
            write = jnp.minimum(t + 1, max_len - 1)

            # bank every EOS candidate in the pool by normalized score
            par_tokens2 = jnp.take_along_axis(
                tokens, src2[..., None], axis=1)               # [B,2K,L]
            par_tokens2 = jax.lax.dynamic_update_slice(
                par_tokens2, tok2[..., None], (0, 0, write))
            lens2 = jnp.take_along_axis(lens, src2, axis=1) + 1
            norm2 = cand2 / jnp.maximum(lens2, 1).astype(
                jnp.float32) ** length_penalty
            fin_norm = jnp.where(is_eos2, norm2, -jnp.inf)
            all_norm = jnp.concatenate([bank_norm, fin_norm], axis=1)
            all_tokens = jnp.concatenate([bank_tokens, par_tokens2],
                                         axis=1)
            bank_norm, bidx = jax.lax.top_k(all_norm, K)       # [B, K]
            bank_tokens = jnp.take_along_axis(
                all_tokens, bidx[..., None], axis=1)

            # live beams: the best K non-EOS candidates continue
            live2 = jnp.where(is_eos2, -jnp.inf, cand2)
            new_scores, lidx = jax.lax.top_k(live2, K)         # [B, K]
            src = jnp.take_along_axis(src2, lidx, axis=1)
            tok = jnp.take_along_axis(tok2, lidx, axis=1)
            tokens = jnp.take_along_axis(tokens, src[..., None], axis=1)
            lens = jnp.take_along_axis(lens, src, axis=1) + 1
            gather = (batch_off + src).reshape(B * K)          # [B·K]
            caches = [(ck[gather], cv[gather]) for ck, cv in caches]
            tokens = jax.lax.dynamic_update_slice(
                tokens, tok[..., None], (0, 0, write))
            return (tokens, caches, new_scores, lens,
                    bank_tokens, bank_norm), None

        (tokens, _, scores, lens, bank_tokens, bank_norm), _ = \
            jax.lax.scan(
                step,
                (tokens0, caches, scores0, lens0,
                 bank_tokens0, bank_norm0),
                jnp.arange(max_len - 1))

        # winner: best normalized hypothesis over the finished bank and
        # any still-live (never-finished) beams — HF's end-of-decode
        # fallback when fewer than K hypotheses finished
        live_norm = scores / jnp.maximum(lens, 1).astype(
            jnp.float32) ** length_penalty
        all_norm = jnp.concatenate([bank_norm, live_norm], axis=1)
        all_tokens = jnp.concatenate([bank_tokens, tokens], axis=1)
        best = jnp.argmax(all_norm, axis=1)                    # [B]
        return jnp.take_along_axis(
            all_tokens, best[:, None, None], axis=1)[:, 0]


def init_blip(cfg: Optional[BlipConfig] = None, seed: int = 0):
    cfg = cfg or blip_base()
    model = BlipCaptioner(cfg)
    rng = jax.random.PRNGKey(seed)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    ids = jnp.zeros((1, 4), jnp.int32)
    params = model.init(rng, px, ids)["params"]
    return model, params
