"""Module constants — parity with the reference pymodule registration
(`nu_scaler_core/src/lib.rs:746-761`).

The reference exposes PyO3 enum values; here they are str-derived enum members
so they both compare as tokens and remain valid constructor arguments (every
reference constructor parses case-insensitive strings, lib.rs:50-62).
"""

from __future__ import annotations

import enum


class UpscalingQuality(str, enum.Enum):
    ULTRA = "ultra"
    QUALITY = "quality"
    BALANCED = "balanced"
    PERFORMANCE = "performance"
    ULTRA_PERFORMANCE = "ultra_performance"
    NATIVE = "native"

    def __str__(self) -> str:  # debug-format name, e.g. "Ultra"
        return self.value

    @staticmethod
    def parse(s: str) -> "UpscalingQuality":
        """Case-insensitive with silent fallback to Quality (lib.rs:51-57)."""
        try:
            return UpscalingQuality(str(s).lower())
        except ValueError:
            return UpscalingQuality.QUALITY


class UpscalingTechnology(str, enum.Enum):
    FSR = "fsr"
    DLSS = "dlss"
    WGPU = "wgpu"
    FALLBACK = "fallback"

    @staticmethod
    def parse(s: str) -> "UpscalingTechnology":
        try:
            return UpscalingTechnology(str(s).lower())
        except ValueError:
            return UpscalingTechnology.FALLBACK


class GpuVendor(str, enum.Enum):
    NVIDIA = "nvidia"
    AMD = "amd"
    INTEL = "intel"
    GOOGLE = "google"
    OTHER = "other"


QUALITY_ULTRA = UpscalingQuality.ULTRA
QUALITY_QUALITY = UpscalingQuality.QUALITY
QUALITY_BALANCED = UpscalingQuality.BALANCED
QUALITY_PERFORMANCE = UpscalingQuality.PERFORMANCE

TECH_FSR = UpscalingTechnology.FSR
TECH_DLSS = UpscalingTechnology.DLSS
TECH_WGPU = UpscalingTechnology.WGPU
TECH_FALLBACK = UpscalingTechnology.FALLBACK

VENDOR_NVIDIA = GpuVendor.NVIDIA
VENDOR_AMD = GpuVendor.AMD
VENDOR_INTEL = GpuVendor.INTEL
VENDOR_OTHER = GpuVendor.OTHER
