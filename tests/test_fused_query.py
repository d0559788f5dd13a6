"""Fused one-dispatch warm query (ids → text tower → scores → window
top-k) must match the unfused embed_texts + window_topk path exactly,
and bucketed table padding must bound the compile count."""

import numpy as np
import pytest


@pytest.fixture()
def engine(tiny_clip):
    from avede_tpu.models.clip import tiny_test_config
    from avede_tpu.parallel.embed import ClipEngine
    from avede_tpu.parallel.mesh import build_mesh

    model, params = tiny_clip
    return ClipEngine(cfg=tiny_test_config(), params=params,
                      mesh=build_mesh())


def _table(engine, n, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, engine.cfg.projection_dim))
    emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)
           ).astype(np.float32)
    mids = np.arange(2, n - 2, 4, dtype=np.int32)
    return emb, mids


class TestFusedQuery:
    def test_matches_unfused(self, engine):
        import jax.numpy as jnp

        from avede_tpu.ops.similarity import window_topk

        emb, mids = _table(engine, 48)
        k = 5
        vals_f, idx_f = engine.query_window_topk(
            "a bright object", emb, mids, k)
        q = engine.embed_texts("a bright object")[0]
        vals_u, idx_u = window_topk(
            jnp.asarray(emb), jnp.ones((len(emb),), bool),
            jnp.asarray(q), jnp.asarray(mids), k=k)
        vals_u, idx_u = np.asarray(vals_u), np.asarray(idx_u)
        keep = np.isfinite(vals_f[:k])
        np.testing.assert_allclose(vals_f[:k][keep], vals_u[keep],
                                   atol=1e-5)
        np.testing.assert_array_equal(idx_f[:k][keep], idx_u[keep])

    def test_padding_never_surfaces(self, engine):
        """Bucket-padded rows/windows score -inf and are filtered by
        callers; every finite slot must index a real window."""
        emb, mids = _table(engine, 20)
        vals, idx = engine.query_window_topk("query", emb, mids, 50)
        finite = np.isfinite(vals)
        assert finite.sum() == len(mids)    # k > W: exactly W real hits
        assert (idx[finite] < len(mids)).all()

    def test_bucketed_compile_count(self, engine):
        """Nearby table lengths share one compiled program."""
        for n in (33, 41, 57):              # all pad to the 64 bucket
            emb, mids = _table(engine, n)
            engine.query_window_topk("q", emb, mids, 3)
        assert engine._query_topk_fn._cache_size() == 1

    def test_text_cache_updated(self, engine):
        emb, mids = _table(engine, 32)
        engine.query_window_topk("warm me", emb, mids, 3)
        assert "warm me" in engine._text_cache
        # the cached vector equals a direct text encode
        q_direct = engine.embed_texts("totally different")[0]  # warm fn
        cached = engine._text_cache["warm me"]
        q_again = engine.embed_texts("warm me")[0]
        np.testing.assert_allclose(cached, q_again, atol=1e-5)
        assert cached.shape == q_direct.shape

    def test_device_table_lru(self, engine):
        """Same host table object → one device upload; different mids
        or a different table object → fresh entry."""
        emb, mids = _table(engine, 32)
        engine.query_window_topk("q1", emb, mids, 3)
        engine.query_window_topk("q2", emb, mids, 3)
        assert len(engine._table_lru) == 1
        other_mids = mids[:-1]
        engine.query_window_topk("q3", emb, other_mids, 3)
        assert len(engine._table_lru) == 2
        emb2, mids2 = _table(engine, 32, seed=9)
        v_a, i_a = engine.query_window_topk("q1", emb2, mids2, 3)
        assert len(engine._table_lru) == 3
        # cached-table path returns the same scores as a fresh engine
        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine
        from avede_tpu.parallel.mesh import build_mesh

        fresh = ClipEngine(cfg=tiny_test_config(),
                           params=engine.params, mesh=build_mesh())
        v_b, i_b = fresh.query_window_topk("q1", emb2, mids2, 3)
        np.testing.assert_allclose(v_a, v_b, atol=1e-6)
        np.testing.assert_array_equal(i_a, i_b)
