"""Benchmark wrappers with plots and CSV export — role of
`nu_scaler_py/nu_scaler/benchmark.py` (P3). Uses `create_best_upscaler`,
which the reference called but never exported (fixed in our core)."""

from __future__ import annotations

import csv
from typing import List, Optional

import nu_scaler_core


class BenchmarkResult:
    """App-side result wrapper (adds formatting/export on top of the core
    PyBenchmarkResult)."""

    FIELDS = [
        "upscaler_name",
        "technology",
        "quality",
        "input_width",
        "input_height",
        "output_width",
        "output_height",
        "scale_factor",
        "avg_frame_time_ms",
        "fps",
        "frames_processed",
        "total_duration_ms",
        "p50_frame_time_ms",
        "p99_frame_time_ms",
    ]

    def __init__(self, py_result=None):
        for f in self.FIELDS:
            setattr(self, f, getattr(py_result, f, 0) if py_result else 0)

    def __str__(self) -> str:
        return (
            f"{self.upscaler_name} [{self.technology}/{self.quality}] "
            f"{self.input_width}x{self.input_height}→{self.output_width}x{self.output_height}: "
            f"{self.fps:.1f} fps ({self.avg_frame_time_ms:.2f} ms avg, "
            f"{self.p50_frame_time_ms:.2f} ms p50)"
        )


def run_benchmark(
    technology: str = "auto",
    quality: str = "balanced",
    input_width: int = 1920,
    input_height: int = 1080,
    scale_factor: float = 1.5,
    frame_count: int = 100,
) -> Optional[BenchmarkResult]:
    """Benchmark one configuration; technology "auto" resolves via the device
    detector (the path benchmark.py:88 wanted)."""
    tech = technology.lower()
    if tech == "auto":
        from nu_scaler_tpu.runtime.detector import detect

        tech = detect().determine_best_upscaling_technology()
    try:
        r = nu_scaler_core.py_benchmark_upscaler(
            tech, quality, input_width, input_height, scale_factor, frame_count
        )
    except Exception as e:  # noqa: BLE001
        print(f"Benchmark error: {e}")
        return None
    return BenchmarkResult(r)


def run_comparison_benchmark(
    input_width: int = 1920,
    input_height: int = 1080,
    scale_factor: float = 1.5,
    frame_count: int = 50,
) -> List[BenchmarkResult]:
    try:
        results = nu_scaler_core.py_run_comparison_benchmark(
            input_width, input_height, scale_factor, frame_count
        )
    except Exception as e:  # noqa: BLE001
        print(f"Comparison benchmark error: {e}")
        return []
    return [BenchmarkResult(r) for r in results]


def export_csv(results: List[BenchmarkResult], path: str) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(BenchmarkResult.FIELDS)
        for r in results:
            w.writerow([getattr(r, field) for field in BenchmarkResult.FIELDS])


def plot_results(results: List[BenchmarkResult], path: Optional[str] = None):
    """FPS bar chart per tech/quality; requires matplotlib (optional here —
    raises a clear error if missing rather than failing at import)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("matplotlib is required for plot_results") from e

    labels = [f"{r.technology}\n{r.quality}" for r in results]
    fps = [r.fps for r in results]
    fig, ax = plt.subplots(figsize=(max(6, len(results)), 4))
    ax.bar(range(len(results)), fps)
    ax.set_xticks(range(len(results)))
    ax.set_xticklabels(labels, fontsize=7)
    ax.set_ylabel("FPS")
    ax.set_title(
        f"Upscaler comparison {results[0].input_width}x{results[0].input_height} "
        f"x{results[0].scale_factor}"
        if results
        else "Upscaler comparison"
    )
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    return fig
