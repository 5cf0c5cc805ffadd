"""Benchmark harness parity (benchmark.rs:72-272)."""

import numpy as np
import pytest

import nu_scaler_core as nsc
from nu_scaler_tpu.bench import harness


def test_test_pattern_golden():
    img = harness.generate_test_pattern(16, 8)
    assert img.shape == (8, 16, 4)
    # spot-check the exact integer math (benchmark.rs:192-199)
    assert img[0, 0, 0] == 0
    assert img[0, 15, 0] == 15 * 255 // 16
    assert img[7, 0, 1] == 7 * 255 // 8
    assert img[3, 5, 2] == (5 + 3) * 255 // (16 + 8)
    assert np.all(img[..., 3] == 255)


def test_benchmark_upscaler_result_fields():
    r = harness.benchmark_upscaler("wgpu", "quality", 64, 48, 2.0, 3)
    assert r.upscaler_name == "WgpuUpscaler"
    assert r.technology == "Wgpu"
    assert r.quality == "Quality"
    assert r.input_resolution == (64, 48)
    assert r.output_resolution == (128, 96)
    assert r.frames_processed == 3
    assert r.avg_frame_time_ms > 0
    assert r.fps > 0
    assert r.p50_frame_time_ms > 0


def test_benchmark_data_too_small():
    with pytest.raises(ValueError, match="Test data too small"):
        harness.benchmark_upscaler("wgpu", "quality", 64, 48, 2.0, 1, b"\x00" * 10)


def test_scale_rounding():
    """output = round(input * scale) (benchmark.rs:97-99)."""
    r = harness.benchmark_upscaler("fallback", "quality", 33, 21, 1.5, 1)
    assert r.output_resolution == (50, 32)  # round(49.5), round(31.5)


def test_py_benchmark_facade():
    r = nsc.py_benchmark_upscaler("fsr", "balanced", 32, 24, 2.0, 2)
    assert r.upscaler_name == "FsrUpscaler"
    assert r.technology == "FSR"
    assert r.input_width == 32 and r.output_width == 64
    assert r.fps > 0


def test_comparison_grid_small():
    results = nsc.py_run_comparison_benchmark(32, 24, 2.0, 1)
    assert len(results) == 16  # 4 tech × 4 quality
    techs = {r.technology for r in results}
    assert techs == {"FSR", "DLSS", "Wgpu", "Fallback"}
