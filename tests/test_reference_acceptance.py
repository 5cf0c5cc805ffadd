"""Run the REFERENCE's own manual test scripts against the rebuilt module.

SURVEY §4: the reference has no engine CI — its hand-run Python scripts ARE
the acceptance suite. Here they execute verbatim from /root/reference (never
copied into this repo) in subprocesses whose PYTHONPATH resolves
`nu_scaler_core` to the rebuild: exit 0 = the original acceptance criteria
pass against the TPU implementation.
"""

import os
import subprocess
import sys

import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPTS = [
    # (path, timeout_s) — the scripts that exercise the public module surface
    ("nu_scaler_py/test_basic.py", 240),       # 320x240 → 2x bilinear, saves PNGs
    ("nu_scaler_py/test_interpolator.py", 600),  # 64² red/blue + 720p/1080p interp
    ("nu_scaler_core/test_core.py", 240),      # import + instantiation smoke
    ("nu_scaler_core/attribute_test.py", 240),  # API introspection
    ("nu_scaler_core/gpu_test.py", 240),       # detection
    ("nu_scaler_py/test_capture.py", 600),     # live fullscreen capture + upscale
]


@pytest.mark.parametrize("rel,timeout", SCRIPTS, ids=[s for s, _ in SCRIPTS])
def test_reference_script_passes(rel, timeout, tmp_path):
    path = os.path.join(REF, rel)
    if not os.path.exists(path):
        pytest.skip(f"reference snapshot not present: {rel}")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    # the scripts save their PNG artifacts to the cwd — sandbox them
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            # the conftest trick: force the CPU backend before the script's
            # first jax touch (the env pin alone is overridden by site config)
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            f"import runpy, sys; sys.argv = [{path!r}]; "
            f"runpy.run_path({path!r}, run_name='__main__')",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{rel} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-3000:]}\n--- stderr ---\n{proc.stderr[-2000:]}"
    )
