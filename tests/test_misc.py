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
