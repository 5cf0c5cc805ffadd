"""Builds the native runtime libraries (g++ -O3): frame ring + y4m demuxer."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "framering.cpp")
LIB = os.path.join(_DIR, "libnuframering.so")
SRC_Y4M = os.path.join(_DIR, "y4m.cpp")
LIB_Y4M = os.path.join(_DIR, "libnuy4m.so")


def _compile(src: str, lib: str, force: bool) -> str:
    if (
        not force
        and os.path.exists(lib)
        and os.path.getmtime(lib) >= os.path.getmtime(src)
    ):
        return lib
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        src, "-o", lib, "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return lib


def build(force: bool = False) -> str:
    """Compile the frame ring if missing/stale; returns the .so path."""
    return _compile(SRC, LIB, force)


def build_y4m(force: bool = False) -> str:
    """Compile the y4m demuxer if missing/stale; returns the .so path."""
    return _compile(SRC_Y4M, LIB_Y4M, force)


if __name__ == "__main__":
    print(build(force=True))
    print(build_y4m(force=True))
