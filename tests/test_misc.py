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
    def test_runs_end_to_end(self, capsys):
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
