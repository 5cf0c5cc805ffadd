"""Visual regression: current kernels must reproduce the committed golden
PNGs (the reference's test_input/test_output artifact pattern)."""

import os

import numpy as np
import pytest

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def _load(name):
    from PIL import Image

    return np.asarray(Image.open(os.path.join(ASSETS, name)).convert("RGBA"))


@pytest.mark.parametrize("algo", ["bilinear", "lanczos3"])
def test_upscale_matches_committed_golden(algo):
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.ops.metrics import psnr

    inp = _load("test_input.png")
    golden = _load(f"test_output_{algo}.png")
    out = np.asarray(resample.upscale_frame(inp, 480, 640, algo))
    assert psnr(out, golden) >= 55.0


def test_interp_matches_committed_golden():
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.ops import interpolate
    from nu_scaler_tpu.ops.metrics import psnr

    a = generate_test_pattern(128, 128)
    b = a[:, ::-1].copy()
    golden = _load("interp_half.png")
    out = np.asarray(interpolate.interpolate_frames(a, b, 0.5, mode="blend"))
    assert psnr(out, golden) >= 55.0
