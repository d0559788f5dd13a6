"""Build the hostops shared library: ``python -m avede_tpu.native.build``."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
SRC = HERE / "hostops.cpp"
OUT = HERE / "libhostops.so"


def build(verbose: bool = True) -> Path:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-march=native", str(SRC), "-o", str(OUT)]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
