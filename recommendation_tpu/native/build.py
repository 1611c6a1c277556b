"""Build the native runtime: ``python -m recommendation_tpu.native.build``.

Uses g++ directly (no pip deps, per environment constraints)."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRCS = [
    os.path.join(HERE, "src", "loader.cpp"),
    os.path.join(HERE, "src", "bucketize.cpp"),
]
OUT = os.path.join(HERE, "librec_native.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        *SRCS, "-o", OUT,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    try:
        path = build()
        print(f"built {path}")
    except subprocess.CalledProcessError as e:
        print(f"native build failed: {e}", file=sys.stderr)
        sys.exit(1)
