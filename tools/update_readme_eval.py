"""Generate README's accuracy table FROM the committed EVAL.json.

Same contract as ``tools/update_readme_perf.py`` (round-3 verdict
item 3): the block between ``<!-- EVAL:BEGIN -->`` and
``<!-- EVAL:END -->`` in README.md renders mechanically from
``EVAL.json`` (written by ``python eval.py --mode all --out
EVAL.json``), and ``tests/test_readme_claims.py`` fails whenever they
disagree — the accuracy claims are exactly as checkable as the perf
claims.

Usage:
    python tools/update_readme_eval.py            # rewrite README block
    python tools/update_readme_eval.py --check    # exit 1 on drift
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BEGIN, END = "<!-- EVAL:BEGIN -->", "<!-- EVAL:END -->"


def _f(v, nd=2):
    return "—" if v is None else f"{v:.{nd}f}"


def render(ev: dict) -> str:
    img = ev.get("image_retrieval", {})
    gnd = ev.get("temporal_grounding", {})
    txt = ev.get("text_retrieval_trained", {})
    det = ev.get("detection_trained", {})
    d4k = ev.get("detection_4k_tiled", {})
    per = ev.get("person_reid_trained", {})
    cap = ev.get("caption_trained", {})
    lib = ev.get("library_search_trained", {})
    bg = ev.get("background_independence", {})
    abl = per.get("ablations", {})
    meta = ev.get("meta", {})

    def ablrow(name):
        a = abl.get(name, {})
        return (f"{_f(a.get('frame_precision_at_k'))} / "
                f"{_f(a.get('recall'))}")

    rows = [
        ("`image`", "reference-image retrieval p@1"
         + (f" (mean of {img.get('n_seeds')} seeds)"
            if img.get("n_seeds") else ""),
         _f(img.get("precision_at_1"))
         + (f" (min {_f(img.get('precision_at_1_min'))})"
            if img.get("precision_at_1_min") is not None else "")),
        ("`grounding`",
         f"mean temporal IoU over {gnd.get('n_seeds', '?')} seeds, "
         f"{gnd.get('train_steps', '?')} steps, through "
         "`Phase3Temporal.ground_query`",
         f"{_f(gnd.get('mean_temporal_iou'))} ± "
         f"{_f(gnd.get('mean_temporal_iou_std'))}"),
        ("`grounding`", "tIoU@0.5 / tIoU@0.7",
         f"{_f(gnd.get('tiou_at_0.5'))} / {_f(gnd.get('tiou_at_0.7'))}"),
        ("`text`", "text→video retrieval p@1 (phase-1 pipeline"
         + (f", mean of {txt.get('n_seeds')} seeds"
            if txt.get("n_seeds") else "") + ")",
         _f(txt.get("precision_at_1"), 4)
         + (f" (min {_f(txt.get('precision_at_1_min'), 4)})"
            if txt.get("precision_at_1_min") is not None else "")),
        ("`detection`",
         "trained YOLO frame P / R (128px scenes, ≤5 objects, IoU≥0.5, "
         "class-aware)",
         f"{_f(det.get('frame_precision'))} / "
         f"{_f(det.get('frame_recall'))}"),
        ("`detection`",
         "trained **OWL-ViT** open-vocab P / R through "
         "`UniversalDetector` (owlvit mode"
         + (f", mean of {det.get('owl_n_seeds')} seeds"
            if det.get("owl_n_seeds") else "") + ")",
         f"{_f(det.get('owlvit_precision'))} / "
         f"{_f(det.get('owlvit_recall'))}"
         + (f" (min {_f(det.get('owlvit_precision_min'))} / "
            f"{_f(det.get('owlvit_recall_min'))})"
            if det.get("owlvit_precision_min") is not None else "")),
        ("`detection`", "small-object VIDEO path P / R (`yolo_enhanced`)",
         f"{_f(det.get('video_path_precision'))} / "
         f"{_f(det.get('video_path_recall'))}"),
        ("`detection4k`",
         f"**tiled 4K** mAP@0.5 (3840×2160, "
         f"{d4k.get('object_size_px', '?')}px objects, "
         f"{d4k.get('tiles_per_frame', '?')} tiles/frame at tile "
         f"{d4k.get('tile_size', '?')}/overlap "
         f"{d4k.get('tile_overlap', '?')} — the SAME geometry "
         f"bench.py measures for speed; {d4k.get('n_seeds', '?')} "
         f"seeds × {d4k.get('frames_per_seed', '?')} frames, "
         f"{d4k.get('objects_total', '?')} objects)",
         f"**{_f(d4k.get('map50'))} ± {_f(d4k.get('map50_std'))}** "
         f"(min {_f(d4k.get('map50_min'))}; reference's own 0.6+ "
         "target)"),
        ("`person`",
         "held-out identity margin (learned re-ID encoder, 48 ids)",
         _f(per.get("identity_margin"))),
        ("`person`",
         "held-out FACE margin (trained face embedding) / face-region "
         "detector IoU",
         f"{_f(per.get('face_margin'))} / "
         f"{_f(per.get('face_detector_iou'))}"),
        ("`person`",
         "crowd search (4 people/frame) frame-p@k / recall through "
         "`PersonSearchService` — full fusion"
         + (", weights fit on a held-out validation video "
            "(`fit_fusion_weights`)"
            if "fixed_reference_weights" in abl else ""),
         ablrow("full")),
    ] + ([
        ("`person`", "… ablation: the reference's fixed 0.6/0.3/0.1 "
         "fusion weights", ablrow("fixed_reference_weights")),
    ] if "fixed_reference_weights" in abl else []) + [
        ("`person`", "… ablation: appearance cue only",
         ablrow("appearance_only")),
        ("`person`", "… ablation: face cue only (trained detector + "
         "face embedding)", ablrow("face_only")),
        ("`person`", "… ablation: untrained geometric gray-crop "
         "fallback", ablrow("geometric_fallback")),
        ("`background`",
         "cross-background matching success through "
         "`BackgroundIndependentService` (reference target 85%, "
         "reference measures 0%)",
         f"**{_f(bg.get('success_rate'))}** (raw-crop CLIP baseline "
         f"{_f(bg.get('raw_crop_clip_baseline'))})"),
        ("`caption`", "trained BLIP caption exact-match"
         + (f" (mean of {cap.get('n_seeds')} seeds)"
            if cap.get("n_seeds") else ""),
         _f(cap.get("caption_exact_match"), 4)
         + (f" (min {_f(cap.get('caption_exact_match_min'), 4)})"
            if cap.get("caption_exact_match_min") is not None else "")),
        ("`caption`", "caption↔query rerank pairs correct",
         _f(cap.get("rerank_pairs_correct"))),
        ("`library`", "whole-library video@1 / hit@1 (device index"
         + (f", mean of {lib.get('n_seeds')} seeds"
            if lib.get("n_seeds") else "") + ")",
         f"{_f(lib.get('video_at_1'))} / {_f(lib.get('hit_at_1'))}"
         + (f" (min {_f(lib.get('video_at_1_min'))} / "
            f"{_f(lib.get('hit_at_1_min'))})"
            if lib.get("video_at_1_min") is not None else "")),
    ]
    # provenance stamp: sections are refreshed individually (eval.py
    # single-mode merges), so the honest citation is the per-section
    # meta_by_mode range — claiming one rev for all 9 modes would
    # misattribute numbers measured at earlier revisions
    by_mode = ev.get("meta_by_mode") or {}
    sections = [k for k in ev
                if k not in ("meta", "meta_by_mode")]
    if not all(k in by_mode for k in sections):
        by_mode = {}  # partial stamps → fall back to honest legacy line
    stamps = [by_mode[k] for k in sorted(by_mode)
              if isinstance(by_mode.get(k), dict)]
    revs = sorted({s.get("git_rev") or "?" for s in stamps})
    dates = sorted({(s.get("date") or "?")[:10] for s in stamps})
    backends = sorted({s.get("backend") or "?" for s in stamps})
    if stamps and len(revs) == 1 and len(dates) == 1:
        stamp = (f"sections measured at git {revs[0]} on {dates[0]}, "
                 f"{'/'.join(backends)} backend")
    elif stamps:
        stamp = (f"sections measured individually between "
                 f"{dates[0]} and {dates[-1]} (git "
                 f"{', '.join(revs)}; {'/'.join(backends)} backend) — "
                 "per-section provenance in EVAL.json `meta_by_mode`")
    else:  # legacy artifact without per-section stamps
        stamp = (f"seed {meta.get('seed', '?')}, "
                 f"{meta.get('backend', '?')} backend, "
                 f"{meta.get('date', '?')}, git "
                 f"{meta.get('git_rev', '?')} — last refresh was "
                 f"`--mode {meta.get('mode', '?')}`")
    lines = [
        BEGIN,
        "<!-- GENERATED from EVAL.json by tools/update_readme_eval.py "
        "— edit the template, not this block; "
        "tests/test_readme_claims.py enforces it -->",
        "",
        f"Measured by `python eval.py --mode <mode> --out EVAL.json` "
        f"(committed artifact; {stamp}). The table renders from "
        "EVAL.json; `tests/test_readme_claims.py` fails on drift.",
        "",
        "| mode | metric | value |",
        "|---|---|---|",
    ]
    for mode, metric, value in rows:
        lines.append(f"| {mode} | {metric} | {value} |")
    lines.append(END)
    return "\n".join(lines)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    ev = json.loads((ROOT / "EVAL.json").read_text())
    readme_path = ROOT / "README.md"
    readme = readme_path.read_text()
    if BEGIN not in readme or END not in readme:
        print(f"README.md is missing {BEGIN}/{END} markers",
              file=sys.stderr)
        return 2
    head, rest = readme.split(BEGIN, 1)
    _, tail = rest.split(END, 1)
    new = head + render(ev) + tail
    if "--check" in argv:
        if new != readme:
            print("README eval block is stale — run "
                  "tools/update_readme_eval.py", file=sys.stderr)
            return 1
        return 0
    if new != readme:
        readme_path.write_text(new)
        print("README eval block regenerated")
    else:
        print("README eval block already current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
