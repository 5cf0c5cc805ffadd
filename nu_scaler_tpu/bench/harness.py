"""Benchmark harness (`benchmark.rs:72-272` parity).

Technology → kernel family mapping (SURVEY §7 step 7):
  * "wgpu"     → the native resample path (bilinear, as the reference's
                 WgpuUpscaler ships)
  * "fsr"      → EASU + RCAS (actually implemented here; the reference's FSR
                 tier silently fell back to nearest)
  * "dlss"     → best-quality path: the learned tier when available, else
                 Lanczos3 (the reference fell back to nearest with a warning)
  * "fallback" → nearest

Timing uses per-call `block_until_ready` so each frame's wall time includes
the device round trip, matching the reference's per-frame Instant timing
around a blocking readback (benchmark.rs:108-122).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

from nu_scaler_tpu.ops import fsr as fsr_ops
from nu_scaler_tpu.ops import resample

TECHNOLOGIES = ("fsr", "dlss", "wgpu", "fallback")
QUALITIES = ("ultra", "quality", "balanced", "performance")

# Debug-format names used in PyBenchmarkResult.technology/.quality
# (format!("{:?}") in benchmark.rs:56-58).
TECH_DEBUG = {"fsr": "FSR", "dlss": "DLSS", "wgpu": "Wgpu", "fallback": "Fallback"}
QUALITY_DEBUG = {
    "ultra": "Ultra",
    "quality": "Quality",
    "balanced": "Balanced",
    "performance": "Performance",
}


@dataclasses.dataclass
class BenchmarkResult:
    """Field parity with `BenchmarkResult` (benchmark.rs:10-21)."""

    upscaler_name: str
    technology: str
    quality: str
    input_resolution: tuple[int, int]
    output_resolution: tuple[int, int]
    scale_factor: float
    avg_frame_time_ms: float
    fps: float
    frames_processed: int
    total_duration_ms: float
    p50_frame_time_ms: float = 0.0  # extension: BASELINE.json asks for p50
    p99_frame_time_ms: float = 0.0


def generate_test_pattern(width: int, height: int) -> np.ndarray:
    """Gradient pattern, exact integer math of benchmark.rs:188-207."""
    x = np.arange(width, dtype=np.uint64)
    y = np.arange(height, dtype=np.uint64)
    img = np.empty((height, width, 4), dtype=np.uint8)
    img[..., 0] = (x * 255 // width).astype(np.uint8)[None, :]
    img[..., 1] = (y * 255 // height).astype(np.uint8)[:, None]
    img[..., 2] = ((x[None, :] + y[:, None]) * 255 // (width + height)).astype(np.uint8)
    img[..., 3] = 255
    return img


def _normalize_tech(technology: str) -> str:
    t = (technology or "").lower()
    return t if t in TECHNOLOGIES else "fallback"  # silent default, benchmark.rs:218-224


def _normalize_quality(quality: str) -> str:
    q = (quality or "").lower()
    return q if q in QUALITIES else "quality"


def make_tech_upscaler(technology: str, quality: str, in_h: int, in_w: int, out_h: int, out_w: int):
    """Compiled u8→u8 upscale fn + display name for a tech/quality combo."""
    technology = _normalize_tech(technology)
    quality = _normalize_quality(quality)
    if technology == "fsr":
        return fsr_ops.make_fsr_upscaler(in_h, in_w, out_h, out_w, quality), "FsrUpscaler"
    if technology == "dlss":
        try:
            from nu_scaler_tpu.models import esrgan_lite

            # quality ladder: performance/balanced requests serve the fast
            # stride-8 learned archs (same mapping as the NuScaler facade)
            build = (
                esrgan_lite.make_fast_upscaler
                if quality in ("performance", "balanced")
                else esrgan_lite.make_pretrained_upscaler
            )
            return build(in_h, in_w, out_h, out_w), "LearnedUpscaler"
        except Exception:
            return make_tech_upscaler("wgpu", "ultra", in_h, in_w, out_h, out_w)[0], "WgpuUpscaler"
    if technology == "wgpu":
        return resample.make_resampler(in_h, in_w, out_h, out_w, "bilinear"), "WgpuUpscaler"
    return resample.make_resampler(in_h, in_w, out_h, out_w, "nearest"), "WgpuUpscaler"


def benchmark_upscaler(
    technology: str,
    quality: str,
    input_width: int,
    input_height: int,
    scale_factor: float,
    frame_count: int,
    test_data: np.ndarray | bytes | None = None,
) -> BenchmarkResult:
    """`benchmark_upscaler` (benchmark.rs:72-136)."""
    if test_data is None:
        test_data = generate_test_pattern(input_width, input_height)
    if isinstance(test_data, (bytes, bytearray)):
        expected = input_width * input_height * 4
        if len(test_data) < expected:
            raise ValueError("Test data too small for the specified input resolution")
        test_data = np.frombuffer(bytes(test_data[:expected]), dtype=np.uint8).reshape(
            input_height, input_width, 4
        )

    output_width = int(round(input_width * scale_factor))
    output_height = int(round(input_height * scale_factor))

    fn, name = make_tech_upscaler(
        technology, quality, input_height, input_width, output_height, output_width
    )

    frame_dev = jax.device_put(test_data)
    fn(frame_dev).block_until_ready()  # compile outside the timed loop

    frame_times = []
    start = time.perf_counter()
    for _ in range(frame_count):
        t0 = time.perf_counter()
        fn(frame_dev).block_until_ready()
        frame_times.append((time.perf_counter() - t0) * 1000.0)
    total_ms = (time.perf_counter() - start) * 1000.0

    avg = float(np.mean(frame_times))
    return BenchmarkResult(
        upscaler_name=name,
        technology=TECH_DEBUG[_normalize_tech(technology)],
        quality=QUALITY_DEBUG[_normalize_quality(quality)],
        input_resolution=(input_width, input_height),
        output_resolution=(output_width, output_height),
        scale_factor=float(scale_factor),
        avg_frame_time_ms=avg,
        fps=1000.0 / avg if avg > 0 else float("inf"),
        frames_processed=frame_count,
        total_duration_ms=total_ms,
        p50_frame_time_ms=float(np.percentile(frame_times, 50)),
        p99_frame_time_ms=float(np.percentile(frame_times, 99)),
    )


def run_upscaler_comparison(
    input_width: int, input_height: int, scale_factor: float, frame_count: int
) -> list[BenchmarkResult]:
    """{FSR, DLSS, Wgpu, Fallback} × {Ultra, Quality, Balanced, Performance}
    grid (benchmark.rs:139-185)."""
    test_data = generate_test_pattern(input_width, input_height)
    results = []
    for tech in TECHNOLOGIES:
        for quality in QUALITIES:
            try:
                results.append(
                    benchmark_upscaler(
                        tech, quality, input_width, input_height, scale_factor, frame_count, test_data
                    )
                )
            except Exception as e:  # noqa: BLE001 — grid keeps going, benchmark.rs:179
                print(f"Error benchmarking {tech}/{quality}: {e}")
    return results
