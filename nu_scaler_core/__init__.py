"""nu_scaler_core — TPU-native drop-in for the reference PyO3 module.

Exports the exact surface registered by the reference's `#[pymodule]`
(`nu_scaler_core/src/lib.rs:743-812`) so existing consumers
(`nu_scaler_py/nu_scaler/main.py`, benchmark.py, gpu_optimizer.py) import it
unchanged — plus `create_best_upscaler`, which the reference's own Python UI
called but its Rust module never exported (SURVEY §2.3 "known drift").

Everything is backed by jit-compiled JAX/XLA/Pallas pipelines; see the
`nu_scaler_tpu` package for internals.
"""

from nu_scaler_core._constants import (
    QUALITY_BALANCED,
    QUALITY_PERFORMANCE,
    QUALITY_QUALITY,
    QUALITY_ULTRA,
    TECH_DLSS,
    TECH_FALLBACK,
    TECH_FSR,
    TECH_WGPU,
    VENDOR_AMD,
    VENDOR_INTEL,
    VENDOR_NVIDIA,
    VENDOR_OTHER,
    GpuVendor,
    UpscalingQuality,
    UpscalingTechnology,
)
from nu_scaler_core.benchmark import (
    PyBenchmarkResult,
    py_benchmark_upscaler,
    py_run_comparison_benchmark,
)
from nu_scaler_core.capture import (
    PyCaptureTarget,
    PyRegion,
    PyScreenCapture,
    PyWindowByTitle,
)
from nu_scaler_core.facade import NuScaler
from nu_scaler_core.interpolator import WgpuFrameInterpolator, create_interpolator
from nu_scaler_core.technologies import (
    NISUpscaler,
    PassThroughUpscaler,
    create_upscaler,
    is_supported,
    upscale_image_file,
)
from nu_scaler_core.upscaler import (
    PyAdvancedWgpuUpscaler,
    PyFsrUpscaler,
    PyVramStats,
    PyWgpuUpscaler,
    create_advanced_upscaler,
    create_best_upscaler,
    create_fsr_upscaler,
)

__version__ = "0.1.0"

__all__ = [
    "PyWgpuUpscaler",
    "PyAdvancedWgpuUpscaler",
    "PyFsrUpscaler",
    "PyScreenCapture",
    "PyCaptureTarget",
    "PyWindowByTitle",
    "PyRegion",
    "PyVramStats",
    "PyBenchmarkResult",
    "NuScaler",
    "WgpuFrameInterpolator",
    "create_interpolator",
    "create_advanced_upscaler",
    "create_fsr_upscaler",
    "create_best_upscaler",
    "create_upscaler",
    "is_supported",
    "upscale_image_file",
    "PassThroughUpscaler",
    "NISUpscaler",
    "py_benchmark_upscaler",
    "py_run_comparison_benchmark",
    "UpscalingQuality",
    "UpscalingTechnology",
    "GpuVendor",
    "QUALITY_ULTRA",
    "QUALITY_QUALITY",
    "QUALITY_BALANCED",
    "QUALITY_PERFORMANCE",
    "TECH_FSR",
    "TECH_DLSS",
    "TECH_WGPU",
    "TECH_FALLBACK",
    "VENDOR_NVIDIA",
    "VENDOR_AMD",
    "VENDOR_INTEL",
    "VENDOR_OTHER",
]
