"""README's benchmark table must equal what the committed artifact
renders — the mechanical guard against the number drift the round-2
and round-3 verdicts both caught (README ranges quoted from memory
while the ledger said otherwise)."""

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def test_readme_bench_block_matches_artifact():
    from tools import update_readme_perf as gen

    readme = (ROOT / "README.md").read_text()
    assert gen.BEGIN in readme and gen.END in readme
    committed = readme.split(gen.BEGIN, 1)[1].split(gen.END, 1)[0]
    artifact = json.loads((ROOT / "BENCH_LAST_GOOD.json").read_text())
    rendered = gen.render(artifact)
    expected = rendered.split(gen.BEGIN, 1)[1].split(gen.END, 1)[0]
    assert committed == expected, (
        "README bench block is stale vs BENCH_LAST_GOOD.json — run "
        "python tools/update_readme_perf.py")


def test_generated_block_quotes_only_ledger_ranges():
    """Every numeric range in the generated block must come from the
    artifact's across_runs spread (by construction _rng only reads the
    spread; this asserts the spread keys referenced all exist in
    bench.LEDGER_KEYS so a renamed ledger key can't silently render
    em-dashes forever)."""
    import bench
    from tools import update_readme_perf as gen  # noqa: F401

    for key in ("fps", "cold_e2e_p50_s", "cold_quiet_s",
                "decode_only_s", "dedup_wall_s", "warm_query_ms",
                "advanced_warm_ms", "advanced_cold_ms", "tiled_4k_fps",
                "library_ms", "projection_s", "per_batch_sync_ms",
                "yolo_fps", "cold_e2e_best_s"):
        assert key in bench.LEDGER_KEYS


def test_readme_eval_block_matches_artifact():
    from tools import update_readme_eval as gen

    readme = (ROOT / "README.md").read_text()
    assert gen.BEGIN in readme and gen.END in readme
    committed = readme.split(gen.BEGIN, 1)[1].split(gen.END, 1)[0]
    eval_path = ROOT / "EVAL.json"
    assert eval_path.exists(), (
        "EVAL.json missing — run python eval.py --mode all --out "
        "EVAL.json (the committed accuracy artifact)")
    rendered = gen.render(json.loads(eval_path.read_text()))
    expected = rendered.split(gen.BEGIN, 1)[1].split(gen.END, 1)[0]
    assert committed == expected, (
        "README eval block is stale vs EVAL.json — run "
        "python tools/update_readme_eval.py")


def test_perf_generator_range_formatting():
    from tools.update_readme_perf import _rng

    spread = {"fps": {"min": 8442.3, "max": 8732.18, "n": 9},
              "one": {"min": 2.0, "max": 2.0, "n": 1}}
    assert _rng(spread, "fps", 0) == "8,442–8,732 (9 runs)"
    assert _rng(spread, "one", 1) == "2 (1 run)"
    assert _rng(spread, "absent") == "—"
    assert _rng(None, "fps") == "—"


def test_generators_render_from_partial_artifacts():
    """Both generators must render (with em-dashes) from artifacts
    missing whole sections — a half-populated ledger must never crash
    the README pipeline."""
    from tools import update_readme_eval, update_readme_perf

    perf = update_readme_perf.render(
        {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 0.1,
         "detail": {}})
    assert update_readme_perf.BEGIN in perf and "—" in perf
    ev = update_readme_eval.render({})
    assert update_readme_eval.BEGIN in ev and "—" in ev


def test_eval_stamp_uses_per_section_provenance():
    """The eval block's measurement stamp must not attribute every
    section to the latest merge's rev: single-rev artifacts cite that
    rev, mixed-rev artifacts cite the range, and artifacts whose
    sections predate per-section stamps fall back to an honest
    'last refresh was --mode X' line (round-5 review finding)."""
    from tools.update_readme_eval import render

    m = {"seed": 0, "date": "2026-08-19T02:00:00+00:00",
         "git_rev": "aaaa111", "backend": "tpu"}
    uniform = {"image_retrieval": {}, "caption_trained": {},
               "meta": {**m, "mode": "all"},
               "meta_by_mode": {"image_retrieval": m,
                                "caption_trained": m}}
    out = render(uniform)
    assert "git aaaa111" in out and "--mode all" not in out
    mixed = dict(uniform)
    mixed["meta_by_mode"] = {
        "image_retrieval": m,
        "caption_trained": {**m, "git_rev": "bbbb222",
                            "date": "2026-08-20T03:00:00+00:00"}}
    out = render(mixed)
    assert "aaaa111" in out and "bbbb222" in out
    assert "measured individually" in out
    # a section missing its stamp → the whole-table claim is dropped
    partial = dict(uniform)
    partial["meta_by_mode"] = {"image_retrieval": m}
    partial["meta"] = {**m, "mode": "caption"}
    out = render(partial)
    assert "last refresh was `--mode caption`" in out
