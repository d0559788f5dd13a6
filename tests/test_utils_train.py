"""Registry, host-memory guard, grounding training, checkpoint/resume."""

import numpy as np
import pytest


class TestRegistry:
    def test_lazy_load_and_stats(self):
        from avede_tpu.utils.registry import ModelRegistry

        r = ModelRegistry()
        calls = []
        r.register("a", lambda: calls.append("a") or "A")
        assert r.get("a") == "A"
        assert r.get("a") == "A"
        assert calls == ["a"]  # loaded once
        assert r.status()["stats"]["a"]["uses"] == 2

    def test_dependency_order(self):
        from avede_tpu.utils.registry import ModelRegistry

        r = ModelRegistry()
        order = []
        r.register("top", lambda: order.append("top"), priority=1,
                   depends_on=["base"])
        r.register("base", lambda: order.append("base"), priority=9)
        r.get("top")
        assert order == ["base", "top"]

    def test_load_all_topo(self):
        from avede_tpu.utils.registry import ModelRegistry

        r = ModelRegistry()
        r.register("c", lambda: "c", priority=3, depends_on=["b"])
        r.register("b", lambda: "b", priority=2, depends_on=["a"])
        r.register("a", lambda: "a", priority=1)
        assert r.load_all() == ["a", "b", "c"]

    def test_cycle_detection(self):
        from avede_tpu.utils.registry import ModelRegistry

        r = ModelRegistry()
        r.register("x", lambda: 1, depends_on=["y"])
        r.register("y", lambda: 1, depends_on=["x"])
        with pytest.raises(ValueError, match="cycle"):
            r.load_all()

    def test_evict_lru(self):
        import time as _t
        from avede_tpu.utils.registry import ModelRegistry

        r = ModelRegistry()
        for n in "abc":
            r.register(n, lambda n=n: n)
        for n in "abc":
            r.get(n)
            _t.sleep(0.01)
        victims = r.evict_lru(keep=1)
        assert set(victims) == {"a", "b"}
        assert r.status()["loaded"] == ["c"]

    def test_unknown_model(self):
        from avede_tpu.utils.registry import ModelRegistry

        with pytest.raises(KeyError, match="not registered"):
            ModelRegistry().get("ghost")


class TestMemoryGuard:
    def test_decode_budget_is_sane(self):
        from avede_tpu.utils.memory import decode_budget

        n, rate = decode_budget(1000, (512, 512), 1)
        assert 16 <= n <= 1000
        assert rate >= 1

    def test_chunked(self):
        from avede_tpu.utils.memory import chunked

        assert [list(c) for c in chunked(list(range(5)), 2)] == [
            [0, 1], [2, 3], [4]]


class TestGroundingTraining:
    def test_loss_decreases_on_synthetic_task(self):
        """Train the grounding head on a synthetic localization task:
        saliency high inside a segment around an 'event' embedding."""
        import jax
        import jax.numpy as jnp

        from avede_tpu.models.univtg import tiny_grounding_config
        from avede_tpu.parallel.mesh import build_mesh
        from avede_tpu.parallel.train import (
            create_grounding_train_state, make_grounding_train_step)

        mesh = build_mesh(jax.devices(), shape=[8, 1])
        cfg = tiny_grounding_config(input_dim=16)
        model, state = create_grounding_train_state(cfg)
        step = make_grounding_train_step(model, mesh)

        rng = np.random.default_rng(0)
        B, N, D = 8, 32, 16
        text = rng.normal(size=(B, D)).astype(np.float32)
        frames = rng.normal(size=(B, N, D)).astype(np.float32) * 0.1
        sal_labels = np.zeros((B, N), np.float32)
        off_labels = np.zeros((B, N, 2), np.float32)
        for b in range(B):
            s = rng.integers(4, 20)
            e = s + 6
            frames[b, s:e] += text[b] * 0.5  # event frames correlate
            sal_labels[b, s:e] = 1.0
            for i in range(s, e):
                off_labels[b, i] = [i - s, e - i]
        valid = np.ones((B, N), bool)

        args = [jnp.asarray(x) for x in
                (frames, text, sal_labels, off_labels, valid)]
        losses = []
        for _ in range(12):
            state, m = step(state, *args)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.9, losses


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from avede_tpu.models.univtg import tiny_grounding_config
        from avede_tpu.parallel.train import (
            create_grounding_train_state, restore_checkpoint,
            save_checkpoint)

        import jax

        cfg = tiny_grounding_config(input_dim=16)
        model, state = create_grounding_train_state(cfg)
        # mutate params so restore is observable
        state = state.replace(
            params=jax.tree.map(lambda x: x + 1.0, state.params))
        save_checkpoint(state, str(tmp_path / "ckpt"), step=3)

        _, fresh = create_grounding_train_state(cfg)
        restored = restore_checkpoint(fresh, str(tmp_path / "ckpt"))
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestTrace:
    def test_trace_records_metric(self):
        from avede_tpu.utils.metrics import get_monitor
        from avede_tpu.utils.trace import trace

        with trace("unit_test_op"):
            pass
        assert "unit_test_op" in get_monitor().summary()["operations"]

    def test_profile_noop_without_dir(self, monkeypatch):
        from avede_tpu.utils.trace import profile_to

        monkeypatch.delenv("AVEDE_PROFILE", raising=False)
        with profile_to():
            pass  # must not start a profiler

    def test_profile_captures(self, tmp_path):
        import jax.numpy as jnp

        from avede_tpu.utils.trace import profile_to

        with profile_to(str(tmp_path / "prof")):
            jnp.ones(8).sum().block_until_ready()
        import os

        assert any(os.scandir(tmp_path / "prof"))


class TestSystemOptimizer:
    def test_optimized_context_restores_gc(self):
        import gc

        from avede_tpu.utils.system import optimized_context

        before = gc.get_threshold()
        with optimized_context(gc_thresholds=(123, 9, 9)):
            assert gc.get_threshold() == (123, 9, 9)
        assert gc.get_threshold() == before

    def test_resource_monitor_records_pressure(self):
        import time

        from avede_tpu.utils.metrics import get_monitor
        from avede_tpu.utils.system import ResourceMonitor

        mon = ResourceMonitor(interval_s=0.05).start()
        try:
            deadline = time.time() + 3.0
            while time.time() < deadline:
                ops = get_monitor().summary()["operations"]
                if "host_memory_pressure" in ops:
                    break
                time.sleep(0.05)
            assert "host_memory_pressure" in \
                get_monitor().summary()["operations"]
        finally:
            mon.stop()
