"""Beam-search decode correctness (jax-only; HF comparison lives in
test_blip_parity.py).

The reference delegates caption decoding to HF ``model.generate``
(``/root/reference/src/models/blip_model.py:351``), which carries beam
search; ``BlipCaptioner.generate_beam`` is the TPU-native equivalent.
These tests pin its semantics:

- ``num_beams=1`` is exactly greedy;
- with enough beams the search is exhaustive, so the result must equal
  the brute-force best sequence under the same scoring rule;
- output invariants (BOS start, PAD-after-EOS, static shape) hold.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avede_tpu.models.blip import BlipConfig, init_blip, tiny_blip_config


@pytest.fixture(scope="module")
def tiny_blip():
    cfg = tiny_blip_config()
    model, params = init_blip(cfg, seed=3)
    return model, params, cfg


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    return rng.normal(size=(2, 32, 32, 3)).astype(np.float32)


class TestBeamDecode:
    def test_one_beam_equals_greedy(self, tiny_blip, frames):
        model, params, cfg = tiny_blip
        greedy = np.asarray(model.apply({"params": params}, frames,
                                        method=model.generate))
        beam1 = np.asarray(model.apply({"params": params}, frames, 1,
                                       method=model.generate_beam))
        np.testing.assert_array_equal(greedy, beam1)

    def test_invariants_and_shape(self, tiny_blip, frames):
        model, params, cfg = tiny_blip
        out = np.asarray(model.apply({"params": params}, frames, 3,
                                     method=model.generate_beam))
        assert out.shape == (2, cfg.max_caption_len)
        assert (out[:, 0] == cfg.bos_token_id).all()
        for row in out:
            toks = row.tolist()[1:]
            if cfg.eos_token_id in toks:
                after = toks[toks.index(cfg.eos_token_id) + 1:]
                assert all(t == cfg.pad_token_id for t in after)

    def test_jittable(self, tiny_blip, frames):
        model, params, cfg = tiny_blip
        fn = jax.jit(lambda p, px: model.apply(
            {"params": p}, px, 2, method=model.generate_beam))
        out = np.asarray(fn(params, frames))
        assert out.shape == (2, cfg.max_caption_len)

    def test_exhaustive_optimality(self):
        """With K >= vocab and length_penalty=0 (scores compare raw
        cumulative logprob, the regime where beam search is globally
        optimal when every step-1 prefix survives), a 2-step search must
        return the brute-force argmax with the frozen-after-EOS rule."""
        cfg = dataclasses.replace(tiny_blip_config(), vocab_size=12,
                                  bos_token_id=10, eos_token_id=11,
                                  max_caption_len=3)
        model, params = init_blip(cfg, seed=5)
        rng = np.random.default_rng(1)
        px = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
        V, L = cfg.vocab_size, cfg.max_caption_len

        got = np.asarray(model.apply(
            {"params": params}, px, V, length_penalty=0.0,
            method=model.generate_beam))[0]

        # brute force: teacher-force every [bos, t1, t2] in one batch
        ids = np.zeros((V * V, L), np.int32)
        ids[:, 0] = cfg.bos_token_id
        ids[:, 1] = np.repeat(np.arange(V), V)
        ids[:, 2] = np.tile(np.arange(V), V)
        logits = np.asarray(model.apply(
            {"params": params},
            np.broadcast_to(px, (V * V, 32, 32, 3)), jnp.asarray(ids)))
        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
        s1 = logp[np.arange(V * V), 0, ids[:, 1]]
        s2 = logp[np.arange(V * V), 1, ids[:, 2]]
        t1_is_eos = ids[:, 1] == cfg.eos_token_id
        # frozen after EOS: only the PAD continuation exists, score s1
        score = np.where(t1_is_eos, s1, s1 + s2)
        valid = ~t1_is_eos | (ids[:, 2] == cfg.pad_token_id)
        norm = np.where(valid, score, -np.inf)
        best = ids[int(np.argmax(norm))]

        got_list = got.tolist()
        if got_list[1] == cfg.eos_token_id:
            got_list[2] = cfg.pad_token_id
        assert got_list == best.tolist(), (got_list, best.tolist(),
                                           float(np.max(norm)))

    def test_exhaustive_with_length_penalty(self):
        """With K = vocab and length_penalty=1, the winner must be the
        brute-force argmax of score/len — in particular a SHORT finished
        hypothesis whose raw score would fall out of the beam must
        survive via the finished bank (HF BeamHypotheses semantics; the
        pre-bank implementation evicted it)."""
        cfg = dataclasses.replace(tiny_blip_config(), vocab_size=12,
                                  bos_token_id=10, eos_token_id=11,
                                  max_caption_len=3)
        model, params = init_blip(cfg, seed=7)
        rng = np.random.default_rng(2)
        px = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
        V, L = cfg.vocab_size, cfg.max_caption_len

        got = np.asarray(model.apply(
            {"params": params}, px, V, length_penalty=1.0,
            method=model.generate_beam))[0]

        ids = np.zeros((V * V, L), np.int32)
        ids[:, 0] = cfg.bos_token_id
        ids[:, 1] = np.repeat(np.arange(V), V)
        ids[:, 2] = np.tile(np.arange(V), V)
        logits = np.asarray(model.apply(
            {"params": params},
            np.broadcast_to(px, (V * V, 32, 32, 3)), jnp.asarray(ids)))
        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
        s1 = logp[np.arange(V * V), 0, ids[:, 1]]
        s2 = logp[np.arange(V * V), 1, ids[:, 2]]
        t1_is_eos = ids[:, 1] == cfg.eos_token_id
        # normalized: len 1 when finished at t1, else len 2
        score = np.where(t1_is_eos, s1, (s1 + s2) / 2.0)
        valid = ~t1_is_eos | (ids[:, 2] == cfg.pad_token_id)
        norm = np.where(valid, score, -np.inf)
        best = ids[int(np.argmax(norm))]

        got_list = got.tolist()
        if got_list[1] == cfg.eos_token_id:
            got_list[2] = cfg.pad_token_id
        assert got_list == best.tolist(), (got_list, best.tolist())

    def test_beam_not_worse_than_greedy_unnormalized(self, tiny_blip,
                                                     frames):
        """Sanity: with length_penalty=0 the beam winner's cumulative
        logprob should be >= greedy's on these fixed inputs."""
        model, params, cfg = tiny_blip

        def seq_logprob(tokens):
            ids = jnp.asarray(tokens[None, :])
            logits = np.asarray(model.apply({"params": params},
                                            frames[:1], ids))
            logp = np.asarray(jax.nn.log_softmax(
                jnp.asarray(logits), axis=-1))
            total, done = 0.0, False
            for t in range(1, len(tokens)):
                tok = int(tokens[t])
                if done or tok == cfg.pad_token_id:
                    break
                total += float(logp[0, t - 1, tok])
                if tok == cfg.eos_token_id:
                    done = True
            return total

        greedy = np.asarray(model.apply({"params": params}, frames[:1],
                                        method=model.generate))[0]
        beam = np.asarray(model.apply(
            {"params": params}, frames[:1], 4, length_penalty=0.0,
            method=model.generate_beam))[0]
        assert seq_logprob(beam) >= seq_logprob(greedy) - 1e-5


class TestGreedyEarlyExit:
    """``generate`` is a ``lax.while_loop`` that stops once every row
    has emitted EOS; forcing EOS at step 1 must still produce exactly
    [BOS, EOS, PAD...] per row (identical to the fixed-trip decode)."""

    def test_forced_eos_rows_are_padded(self, tiny_blip, frames):
        model, params, cfg = tiny_blip
        forced = jax.tree_util.tree_map(np.array, params)
        bias = forced["text"]["decoder"]["bias"]
        bias[:] = -20.0
        bias[cfg.eos_token_id] = 20.0
        forced["text"]["decoder"]["bias"] = jnp.asarray(bias)
        out = np.asarray(model.apply({"params": forced}, frames,
                                     method=model.generate))
        assert out.shape == (2, cfg.max_caption_len)
        assert (out[:, 0] == cfg.bos_token_id).all()
        assert (out[:, 1] == cfg.eos_token_id).all()
        assert (out[:, 2:] == cfg.pad_token_id).all()

    def test_mixed_done_rows_match_beam1(self, tiny_blip, frames):
        """Early exit must not change results when rows finish at
        different steps (or never): beam==1 path has no early exit and
        serves as the fixed-trip reference."""
        model, params, cfg = tiny_blip
        greedy = np.asarray(model.apply({"params": params}, frames,
                                        method=model.generate))
        ref = np.asarray(model.apply({"params": params}, frames, 1,
                                     method=model.generate_beam))
        np.testing.assert_array_equal(greedy, ref)
