"""Benchmark harness — parity with `nu_scaler_core/src/benchmark.rs`."""

from nu_scaler_tpu.bench.harness import (
    BenchmarkResult,
    benchmark_upscaler,
    generate_test_pattern,
    run_upscaler_comparison,
)

__all__ = [
    "BenchmarkResult",
    "benchmark_upscaler",
    "generate_test_pattern",
    "run_upscaler_comparison",
]
