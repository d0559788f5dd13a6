"""Suite runner with a per-suite pass/fail report.

Role model: reference ``tests/run_tests.py:197-297`` (shells out per
suite, prints a summary table). Usage: ``python tests/run_tests.py``
(optionally ``--fast`` to skip the slow integration suites).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

SUITES = {
    "ops": ["tests/test_ops.py", "tests/test_pallas.py",
            "tests/test_native.py"],
    "models": ["tests/test_clip_parity.py", "tests/test_blip_parity.py",
               "tests/test_detection_models.py",
               "tests/test_qformer_parity.py", "tests/test_models_extra.py"],
    "io": ["tests/test_io.py"],
    "parallel": ["tests/test_parallel.py", "tests/test_utils_train.py"],
    "pipelines": ["tests/test_phase1.py", "tests/test_phase23.py"],
    "services": ["tests/test_detection_services.py",
                 "tests/test_image_matching.py",
                 "tests/test_person_small_bg.py"],
    "api": ["tests/test_api.py"],
}
FAST_SKIP = {"services"}


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--fast", action="store_true",
                        help="skip the slowest integration suites")
    args = parser.parse_args()

    root = Path(__file__).resolve().parent.parent
    results = {}
    for name, files in SUITES.items():
        if args.fast and name in FAST_SKIP:
            results[name] = ("SKIPPED", 0.0)
            continue
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *files],
            cwd=root, capture_output=True, text=True)
        status = "PASS" if proc.returncode == 0 else "FAIL"
        results[name] = (status, time.time() - t0)
        if status == "FAIL":
            print(proc.stdout[-2000:])

    print("\n=== suite report ===")
    width = max(len(n) for n in SUITES)
    failed = 0
    for name, (status, dt) in results.items():
        print(f"  {name:<{width}}  {status:<8} {dt:6.1f}s")
        failed += status == "FAIL"
    print(f"{'ALL GREEN' if failed == 0 else f'{failed} suite(s) FAILED'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
