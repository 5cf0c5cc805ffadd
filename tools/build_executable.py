"""Build a one-file executable of the GUI/headless app — role of the
reference's `build_executable.py` + `nuscaler.spec` (PyInstaller one-file
windowed exe, SURVEY §2.5 Packaging).

Gated on PyInstaller being installed (it is not part of the baked TPU image);
`pip install pyinstaller` first on a deployment box.

    python -m tools.build_executable [--entry nu_scaler/headless.py] [--name nu-scaler]
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--entry", default="nu_scaler/headless.py")
    p.add_argument("--name", default="nu-scaler")
    p.add_argument("--windowed", action="store_true", help="GUI build (no console)")
    p.add_argument(
        "--spec", action="store_true",
        help="build from nuscaler.spec (the full windowed app bundle) instead "
        "of the ad-hoc flag set",
    )
    args = p.parse_args(argv)

    if shutil.which("pyinstaller") is None:
        print(
            "PyInstaller is not installed (not part of the TPU image). "
            "Run `pip install pyinstaller` on the packaging machine.",
            file=sys.stderr,
        )
        return 2

    if args.spec:
        cmd = ["pyinstaller", "nuscaler.spec"]
        print(" ".join(cmd))
        return subprocess.call(cmd)

    cmd = [
        "pyinstaller",
        "--onefile",
        "--name",
        args.name,
        "--hidden-import",
        "nu_scaler_core",
        "--hidden-import",
        "nu_scaler_tpu",
        "--collect-submodules",
        "nu_scaler_tpu",
        "--add-data",
        "nu_scaler_tpu/runtime/native/framering.cpp:nu_scaler_tpu/runtime/native",
        "--add-data",
        "checkpoints:checkpoints",
    ]
    if args.windowed:
        cmd.append("--windowed")
    cmd.append(args.entry)
    print(" ".join(cmd))
    return subprocess.call(cmd)


if __name__ == "__main__":
    raise SystemExit(main())
