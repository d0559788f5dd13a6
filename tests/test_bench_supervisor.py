"""The bench's supervised runner guards the driver artifact: last-good
caching, secondary carry-forward, ledger history, the stale path, and —
since round 4 — the COMPACT driver line (round 3's full-detail stdout
outgrew the driver's tail capture and left BENCH_r03 unparsable).
These tests fake the measurement child so the logic runs in-process."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _fresh(value, cold_p50=3.0, adv_warm=200.0):
    return {"metric": "clip_scan_frames_per_sec_per_chip",
            "value": value, "unit": "frames/sec",
            "vs_baseline": round(value / 30.0, 2),
            "detail": {
                "per_batch_sync_ms": 90.0,
                "warm_query_p50_ms_600frames": 30.0,
                "yolov8n_detect_nms_fps": 1500.0,
                "library_search_p50_ms_1M_rows": 31.0,
                "cold_e2e_v5e8_projection_s": 1.1,
                "cold_e2e": {
                    "cold_e2e_p50_s_600frames": cold_p50,
                    "cold_e2e_p50_quiet_s_600frames": cold_p50 - 1.0,
                    "cold_e2e_best_s_600frames": cold_p50 - 0.5,
                    "decode_only_s_600frames": 1.0,
                    "dedup_semi_static": {"wall_s": 1.5},
                },
                "advanced_mode_p50_ms": {
                    "advanced_cold_p50_ms": 5000.0,
                    "advanced_warm_p50_ms": adv_warm,
                    "first_compile_s": 12.0,
                    "compile_cache_new_entries": 0,
                },
                "tiled_4k": {"frames_per_sec": 19.5, "tile": 640},
            }}


class _Proc:
    def __init__(self, payload):
        self.stdout = "noise\n" + json.dumps(payload) + "\n"
        self.returncode = 0


@pytest.fixture()
def run_supervised(tmp_path, monkeypatch, capsys):
    import bench

    cache = tmp_path / "last_good.json"
    monkeypatch.setenv("AVEDE_BENCH_CACHE", str(cache))

    def run(payload_or_exc):
        def fake_run(*a, **k):
            if isinstance(payload_or_exc, Exception):
                raise payload_or_exc
            return _Proc(payload_or_exc)

        monkeypatch.setattr(subprocess, "run", fake_run)
        bench._supervised()
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return json.loads(out), cache

    return run


class TestSupervised:
    def test_record_run_writes_cache_and_history(self, run_supervised):
        out, cache = run_supervised(_fresh(9000.0))
        assert out["value"] == 9000.0
        cached = json.loads(cache.read_text())
        assert cached["value"] == 9000.0
        hist = cached["detail"]["history"]
        assert len(hist) == 1 and hist[0]["fps"] == 9000.0
        assert hist[0]["cold_e2e_p50_s"] == 3.0
        # round-4 ledger extension: every README-quoted secondary
        assert hist[0]["decode_only_s"] == 1.0
        assert hist[0]["tiled_4k_fps"] == 19.5
        assert hist[0]["warm_query_ms"] == 30.0
        assert hist[0]["projection_s"] == 1.1
        assert hist[0]["cold_quiet_s"] == 2.0
        assert "across_runs" in cached["detail"]

    def test_non_record_merges_secondaries_keeps_best_primary(
            self, run_supervised):
        run_supervised(_fresh(9000.0, cold_p50=3.0))
        out, cache = run_supervised(_fresh(8500.0, cold_p50=2.0,
                                           adv_warm=180.0))
        assert out["value"] == 8500.0           # fresh run reported
        cached = json.loads(cache.read_text())
        assert cached["value"] == 9000.0        # best primary kept
        ce = cached["detail"]["cold_e2e"]
        assert ce["cold_e2e_p50_s_600frames"] == 2.0   # fresh merged
        hist = cached["detail"]["history"]
        assert [h["fps"] for h in hist] == [9000.0, 8500.0]
        spread = cached["detail"]["across_runs"]
        assert spread["cold_e2e_p50_s"] == {"min": 2.0, "max": 3.0,
                                            "n": 2}
        assert spread["advanced_warm_ms"]["min"] == 180.0
        assert spread["tiled_4k_fps"]["n"] == 2

    def test_cold_spread_is_regime_scoped(self, run_supervised):
        """Sparse-scan runs embed ~1/8 of the frames: their cold
        numbers describe a different program than dense-era runs, so
        across_runs cold ranges must cover only the CURRENT scan mode
        (full history still ledgers both)."""
        run_supervised(_fresh(9000.0, cold_p50=8.0))       # dense era
        sparse = _fresh(8800.0, cold_p50=2.0)
        sparse["detail"]["cold_e2e"]["scan_mode"] = "sparse"
        sparse["detail"]["cold_e2e"]["embedded_rows"] = 74
        _, cache = run_supervised(sparse)
        cached = json.loads(cache.read_text())
        spread = cached["detail"]["across_runs"]
        assert spread["cold_scan_mode"] == "sparse"
        # cold keys: sparse-era only
        assert spread["cold_e2e_p50_s"] == {"min": 2.0, "max": 2.0,
                                            "n": 1}
        # regime-independent keys still span both runs
        assert spread["fps"]["n"] == 2
        assert spread["advanced_warm_ms"]["n"] == 2
        hist = cached["detail"]["history"]
        assert [h["scan_mode"] for h in hist] == ["dense", "sparse"]
        assert hist[-1]["embedded_rows"] == 74

    def test_missing_secondary_carried_forward(self, run_supervised):
        run_supervised(_fresh(9000.0))
        crippled = _fresh(9100.0)
        crippled["detail"]["cold_e2e"] = None
        out, cache = run_supervised(crippled)
        # compact line surfaces the carried value + provenance
        assert out["detail"]["cold_e2e_p50_s"] == 3.0
        assert "cold_e2e" in out["detail"]["carried_from_last_good"]
        # carried values must NOT mint a fake history point
        hist = json.loads(cache.read_text())["detail"]["history"]
        assert "cold_e2e_p50_s" not in hist[-1]

    def test_driver_line_is_compact_and_flat(self, run_supervised):
        """The driver tail-captures stdout: the line must stay small
        (round 3's 4 KB+ line came back ``parsed: null``) and detail
        must hold no nested per-run blobs."""
        for i in range(24):      # fill the history ledger to max depth
            run_supervised(_fresh(9000.0 + i))
        out, cache = run_supervised(_fresh(9100.0))
        line = json.dumps(out)
        assert len(line) < 2500, f"driver line too big: {len(line)}B"
        assert "history" not in out["detail"]
        assert out["detail"]["cold_e2e_p50_s"] == 3.0
        assert out["detail"]["cold_quiet_s"] == 2.0
        assert out["detail"]["full_detail"] == "BENCH_LAST_GOOD.json"
        # the full record (history included) still lives in the cache
        cached = json.loads(cache.read_text())
        assert len(cached["detail"]["history"]) == 24

    def test_wedged_tunnel_reports_stale_last_good(self, run_supervised):
        run_supervised(_fresh(9000.0))
        out, _ = run_supervised(
            subprocess.TimeoutExpired(cmd="bench", timeout=1))
        assert out["value"] == 9000.0
        assert out["detail"]["stale"] is True
        assert "stale_reason" in out["detail"]
        assert "history" not in out["detail"]   # stale path compacts too

    def test_wedged_with_no_cache_reports_zero(self, run_supervised):
        out, _ = run_supervised(
            subprocess.TimeoutExpired(cmd="bench", timeout=1))
        assert out["value"] == 0.0
        assert "error" in out["detail"]


def test_quiet_cold_p50_gating():
    """Quiet qualification: pre-section load gates the whole section;
    per-trial steal filters individual trials; per-trial load_1m (self-
    inflated by the bench's own decode workers) must NOT disqualify."""
    import bench

    trials = [{"s": 3.0, "load_1m": 4.8, "steal_pct": 0.0},
              {"s": 2.0, "load_1m": 4.2, "steal_pct": 1.2},
              {"s": 9.0, "load_1m": 4.5, "steal_pct": 35.0},
              {"s": 2.5, "load_1m": 4.1, "steal_pct": 0.3}]
    # stormy section start -> no quiet number at all
    assert bench.quiet_cold_p50(trials, 3.2, 1.0, 10.0) is None
    # quiet start: the 35%-steal trial is excluded, p50 over the rest
    assert bench.quiet_cold_p50(trials, 0.4, 1.0, 10.0) == 2.5
    # all trials stolen -> None rather than a polluted p50
    storm = [dict(t, steal_pct=50.0) for t in trials]
    assert bench.quiet_cold_p50(storm, 0.4, 1.0, 10.0) is None
    # trials without steal annotation (old artifacts) count as quiet
    legacy = [{"s": 4.0, "load_1m": 0.5}]
    assert bench.quiet_cold_p50(legacy, 0.2, 1.0, 10.0) == 4.0
    # membw probe collapse mid-trials (co-tenant resumed after the
    # pre-section load sample) disqualifies the whole section
    assert bench.quiet_cold_p50(trials, 0.4, 1.0, 10.0,
                                membw_before=10.0,
                                membw_after=5.0) is None
    # steady probe keeps the quiet number
    assert bench.quiet_cold_p50(trials, 0.4, 1.0, 10.0,
                                membw_before=10.0,
                                membw_after=9.0) == 2.5
    # legacy artifacts without probes skip the ratio gate
    assert bench.quiet_cold_p50(trials, 0.4, 1.0, 10.0,
                                membw_before=0.0,
                                membw_after=0.0) == 2.5
    # per-trial membw: a burst confined to one trial's window (both
    # endpoint probes read full bandwidth) excludes just that trial
    bw_trials = [{"s": 3.0, "steal_pct": 0.0, "membw_gbps": 10.0},
                 {"s": 9.0, "steal_pct": 0.0, "membw_gbps": 2.0},
                 {"s": 2.0, "steal_pct": 0.0, "membw_gbps": 9.5},
                 {"s": 2.4, "steal_pct": 0.0, "membw_gbps": 9.8}]
    assert bench.quiet_cold_p50(bw_trials, 0.4, 1.0, 10.0,
                                membw_before=10.0,
                                membw_after=10.0) == 2.4
    # all trials squashed mid-window -> no quiet number
    squashed = [dict(t, membw_gbps=2.0) for t in bw_trials]
    assert bench.quiet_cold_p50(squashed, 0.4, 1.0, 10.0,
                                membw_before=10.0,
                                membw_after=10.0) is None
    # endpoint dip with per-trial probes all healthy: the trials carry
    # direct evidence of quiet — a burst that began during the AFTER
    # probe must not discard them (round-5 review finding)
    assert bench.quiet_cold_p50(bw_trials[2:], 0.4, 1.0, 10.0,
                                membw_before=10.0,
                                membw_after=5.0) == 2.4
    # steady whole-section contention: every probe equally depressed
    # passes all relative gates — only the absolute floor catches it
    steady = [dict(t, membw_gbps=2.0) for t in bw_trials]
    assert bench.quiet_cold_p50(steady, 0.4, 1.0, 10.0,
                                membw_before=2.0,
                                membw_after=2.0) is not None  # the hole
    assert bench.quiet_cold_p50(steady, 0.4, 1.0, 10.0,
                                membw_before=2.0, membw_after=2.0,
                                membw_floor_gbps=4.0) is None  # closed
    # healthy section passes the floor untouched
    assert bench.quiet_cold_p50(bw_trials[2:], 0.4, 1.0, 10.0,
                                membw_before=10.0, membw_after=10.0,
                                membw_floor_gbps=4.0) == 2.4


def test_membw_quiet_floor(monkeypatch):
    import bench

    monkeypatch.setenv("AVEDE_MEMBW_FLOOR_GBPS", "3.5")
    assert bench.membw_quiet_floor() == 3.5
    monkeypatch.delenv("AVEDE_MEMBW_FLOOR_GBPS")
    # ledger-derived: 0.4 × best historic pre-trial probe
    floor = bench.membw_quiet_floor()
    import json as _json
    from pathlib import Path
    ledger = _json.loads(
        (Path(bench.__file__).parent / "BENCH_LAST_GOOD.json")
        .read_text())
    hist = ledger.get("detail", {}).get("history", [])
    best = max((e.get("membw_gbps") or 0.0) for e in hist)
    assert floor == (round(0.4 * best, 2) if best > 0.0 else 0.0)
