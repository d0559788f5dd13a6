"""Supervised server launcher.

Role model: reference ``robust_server.py`` — a supervisor that frees
stale processes, gates launch on available memory, health-monitors the
port, and auto-restarts with backoff (``/root/reference/
robust_server.py:50-221``). Rebuilt for the aiohttp API server (the
reference supervises streamlit): memory gate, liveness probe against
``/api/health``, ≤5 restarts with 30 s backoff, SIGINT/SIGTERM
passthrough.
"""

from __future__ import annotations

import argparse
import signal
import subprocess
import sys
import time
import urllib.request

MIN_FREE_MB = 1500
MAX_RESTARTS = 5
BACKOFF_S = 30
HEALTH_PERIOD_S = 10


def free_memory_mb() -> float:
    try:
        import psutil

        return psutil.virtual_memory().available / (1024 ** 2)
    except ImportError:
        return float("inf")


def healthy(port: int) -> bool:
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/health", timeout=5) as r:
            return r.status == 200
    except Exception:  # noqa: BLE001
        return False


def main() -> int:
    parser = argparse.ArgumentParser(description="AVEDE-TPU supervisor")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", default="0.0.0.0")
    args = parser.parse_args()

    stop = {"flag": False}

    def on_signal(signum, frame):
        stop["flag"] = True

    signal.signal(signal.SIGINT, on_signal)
    signal.signal(signal.SIGTERM, on_signal)

    restarts = 0
    proc: subprocess.Popen | None = None
    while not stop["flag"] and restarts <= MAX_RESTARTS:
        free = free_memory_mb()
        if free < MIN_FREE_MB:
            print(f"[supervisor] only {free:.0f} MB free "
                  f"(need {MIN_FREE_MB}); waiting...")
            time.sleep(BACKOFF_S)
            continue

        print(f"[supervisor] starting API server on :{args.port} "
              f"(attempt {restarts + 1})")
        proc = subprocess.Popen(
            [sys.executable, "-m", "avede_tpu.api.app",
             "--host", args.host, "--port", str(args.port)])

        # wait for liveness (model load can take a while)
        deadline = time.time() + 300
        while time.time() < deadline and proc.poll() is None \
                and not healthy(args.port) and not stop["flag"]:
            time.sleep(2)

        while not stop["flag"] and proc.poll() is None:
            time.sleep(HEALTH_PERIOD_S)
            if not healthy(args.port):
                print("[supervisor] health check failed; restarting")
                proc.terminate()
                try:
                    proc.wait(timeout=15)
                except subprocess.TimeoutExpired:
                    proc.kill()
                break
            if free_memory_mb() < MIN_FREE_MB / 2:
                print("[supervisor] memory critical; restarting")
                proc.terminate()
                break

        if stop["flag"]:
            break
        restarts += 1
        print(f"[supervisor] backing off {BACKOFF_S}s")
        time.sleep(BACKOFF_S)

    if proc is not None and proc.poll() is None:
        print("[supervisor] shutting down server")
        proc.terminate()
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
    return 0


if __name__ == "__main__":
    sys.exit(main())
