"""Supervisor helpers, built-in UI payload, examples smoke."""

import numpy as np
import pytest


class TestSupervisorHelpers:
    def test_free_memory(self):
        import robust_server

        assert robust_server.free_memory_mb() > 0

    def test_healthy_false_when_nothing_listens(self):
        import robust_server

        assert robust_server.healthy(59999) is False


class TestBuiltinUI:
    def test_page_has_all_three_modes(self):
        from avede_tpu.web.builtin import INDEX_HTML

        for needle in ("/api/query", "/api/enhanced-person-detection",
                       "/api/image-matching-by-id", "/api/upload",
                       "Text query", "Person detection", "Image matching"):
            assert needle in INDEX_HTML


class TestQuickstartExample:
    def test_runs_end_to_end(self, capsys, tmp_data_dirs):
        import sys

        sys.argv = ["quickstart"]
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "qs", "examples/quickstart.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        m.main()
        outp = capsys.readouterr().out
        assert "text query" in outp
        assert "multi-query" in outp


class TestComputeDtype:
    """Default-constructed services pick the platform compute dtype
    (bf16 on accelerators per settings.COMPUTE_DTYPE, f32 on CPU);
    explicit configs are never overridden."""

    def test_cpu_backend_is_float32(self):
        from avede_tpu.utils.platform import compute_dtype

        assert compute_dtype() == "float32"

    def test_accelerator_uses_settings(self, monkeypatch):
        import jax

        from avede_tpu.utils import platform as plat
        from avede_tpu.utils.config import settings

        class FakeDev:
            platform = "tpu"

        monkeypatch.setattr(jax, "devices", lambda: [FakeDev()])
        assert plat.compute_dtype() == settings.COMPUTE_DTYPE

    def test_default_engine_cfg_uses_compute_dtype(self):
        from avede_tpu.models.clip import tiny_test_config
        from avede_tpu.parallel.embed import ClipEngine

        cfg = tiny_test_config()
        eng = ClipEngine(cfg=cfg)
        assert eng.cfg.dtype == "float32"  # explicit cfg untouched

    def test_default_yolo_cfg_uses_compute_dtype(self, monkeypatch):
        import dataclasses

        from avede_tpu.services import detector as det

        # on CPU the default must resolve to f32 (not settings bf16)
        svc_cfg_dtype = {}
        orig = det.init_yolo

        def spy(cfg, seed=0):
            svc_cfg_dtype["dtype"] = cfg.dtype
            # shrink to a tiny net so construction is instant
            tiny = dataclasses.replace(cfg, num_classes=4, img_size=64)
            return orig(tiny, seed=seed)

        monkeypatch.setattr(det, "init_yolo", spy)
        det.YoloService()
        assert svc_cfg_dtype["dtype"] == "float32"


class TestSyntheticPersonHelpers:
    """New round-3 synthetic-world helpers: per-video outfits, detector
    box-noise augmentation, codec augmentation."""

    def test_with_outfit_pins_clothing_per_video(self):
        from avede_tpu.utils.synthetic import (draw_person, make_identity,
                                               with_outfit)

        rng = np.random.default_rng(0)
        ident = with_outfit(make_identity(rng), rng)
        assert len(ident["clothing"]) == 3 and len(ident["legc"]) == 3
        # torso pixels identical across frames (same outfit)
        f1, b1 = draw_person(ident, np.random.default_rng(1))
        f2, b2 = draw_person(ident, np.random.default_rng(2))

        def torso_color(frame, bb):
            x0, y0, x1, y1 = (int(v) for v in bb)
            cy = y0 + int((y1 - y0) * 0.4)
            cx = (x0 + x1) // 2
            return tuple(frame[cy, cx])

        # draw_person applies a global lighting gain per view, so the
        # torso keeps its CHROMATICITY (color direction), not raw value
        c1 = np.asarray(torso_color(f1, b1), np.float32)
        c2 = np.asarray(torso_color(f2, b2), np.float32)
        cos = float(c1 @ c2 / (np.linalg.norm(c1) * np.linalg.norm(c2)))
        assert cos > 0.995

    def test_jitter_bbox_moves_edges_proportionally(self):
        from avede_tpu.utils.synthetic import jitter_bbox

        rng = np.random.default_rng(0)
        bbox = [10.0, 20.0, 50.0, 100.0]
        outs = np.array([jitter_bbox(bbox, rng, frac=0.08)
                         for _ in range(200)])
        deltas = outs - np.array(bbox)
        # zero-mean noise scaled by box dims (w=40, h=80)
        assert abs(deltas.mean(0)).max() < 2.0
        assert 1.5 < deltas[:, 0].std() < 6.0      # ~0.08*40=3.2
        assert 3.0 < deltas[:, 1].std() < 12.0     # ~0.08*80=6.4
        assert np.allclose(jitter_bbox(bbox, rng, frac=0.0), bbox)

    def test_identity_batch_augmentation_flags(self):
        from avede_tpu.utils.synthetic import identity_batch, make_identity

        rng = np.random.default_rng(0)
        ids = [make_identity(rng) for _ in range(4)]
        a, b = identity_batch(ids, rng, crop_size=32)
        assert a.shape == b.shape == (4, 32, 32, 3)
        assert 0.0 <= a.min() and a.max() <= 1.0
        # flags off still produce valid batches
        a2, _ = identity_batch(ids, rng, crop_size=32, codec_aug=False,
                               box_jitter=0.0)
        assert a2.shape == (4, 32, 32, 3)


class TestCompileCache:
    def test_enable_compile_cache_sets_config(self, tmp_path,
                                              monkeypatch):
        import jax

        from avede_tpu.utils.config import settings
        from avede_tpu.utils.platform import enable_compile_cache

        cache = tmp_path / "xla_cache"
        monkeypatch.setattr(settings, "XLA_CACHE_DIR", str(cache))
        enable_compile_cache()
        assert cache.exists()
        assert jax.config.jax_compilation_cache_dir == str(cache)
        # restore the conftest-wide cache dir for later tests
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/avede_jax_cache")

    def test_empty_dir_disables(self, monkeypatch):
        import jax

        from avede_tpu.utils.config import settings
        from avede_tpu.utils.platform import enable_compile_cache

        before = jax.config.jax_compilation_cache_dir
        monkeypatch.setattr(settings, "XLA_CACHE_DIR", "")
        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == before
