"""Builds libnuframering.so from framering.cpp with g++ -O3."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "framering.cpp")
LIB = os.path.join(_DIR, "libnuframering.so")


def build(force: bool = False) -> str:
    """Compile if missing/stale; returns the .so path. Raises on failure."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        SRC,
        "-o",
        LIB,
        "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
