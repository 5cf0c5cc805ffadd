"""Accelerator detection — the `GpuDetector` role
(`nu_scaler_core/src/gpu/detector.rs:89-262`) mapped onto the JAX device
topology.

The reference enumerates wgpu adapters, picks a primary by
discrete > NVIDIA > AMD > Intel, and chooses an upscaling technology by
vendor. Here the "adapters" are `jax.devices()`: TPU chips first, then GPU,
then CPU hosts; the technology choice maps onto our kernel families
("wgpu" = the native Pallas/XLA resample path, "fallback" = plain nearest).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax

# Vendor constants mirror detector.rs:49-54's vendor-id map, extended with the
# platforms that actually exist here.
VENDOR_GOOGLE = "Google"
VENDOR_NVIDIA = "Nvidia"
VENDOR_AMD = "Amd"
VENDOR_INTEL = "Intel"
VENDOR_OTHER = "Other"


@dataclasses.dataclass
class DeviceInfo:
    """Parity with `GpuInfo` (detector.rs:29-47) + the `get_gpu_info()` dict
    keys (lib.rs:667-704)."""

    name: str
    vendor: str
    device_type: str  # "Tpu" | "Gpu" | "Cpu" — format!("{:?}") style
    backend: str  # "XLA"
    vendor_id: int
    device_id: int
    driver_info: str
    is_discrete: bool
    platform: str
    core_count: int = 1
    process_index: int = 0

    def as_dict(self) -> dict:
        return {
            "name": self.name,
            "vendor": self.vendor,
            "device_type": self.device_type,
            "backend": self.backend,
            "vendor_id": f"0x{self.vendor_id:X}",
            "device_id": f"0x{self.device_id:X}",
            "driver_info": self.driver_info,
            "is_discrete": self.is_discrete,
        }


def _info_from_device(dev, idx: int) -> DeviceInfo:
    platform = dev.platform  # "tpu" | "gpu" | "cpu"
    kind = getattr(dev, "device_kind", platform)
    if platform == "tpu":
        vendor, dtype, discrete = VENDOR_GOOGLE, "Tpu", True
    elif platform == "gpu":
        vendor, dtype, discrete = VENDOR_NVIDIA, "Gpu", True
    else:
        vendor, dtype, discrete = VENDOR_OTHER, "Cpu", False
    return DeviceInfo(
        name=str(kind),
        vendor=vendor,
        device_type=dtype,
        backend="XLA",
        vendor_id={"tpu": 0x1AE0, "gpu": 0x10DE}.get(platform, 0x0),  # 0x1AE0 = Google
        device_id=idx,
        driver_info=f"jax {jax.__version__}",
        is_discrete=discrete,
        platform=platform,
        core_count=getattr(dev, "num_cores", 1) or 1,
        process_index=getattr(dev, "process_index", 0),
    )


class DeviceDetector:
    """`GpuDetector` parity: detect_gpus / get_primary_gpu /
    determine_best_upscaling_technology / create_device_queue analog."""

    def __init__(self) -> None:
        self.devices: list[DeviceInfo] = []
        self._jax_devices: list = []

    def detect_gpus(self) -> list[DeviceInfo]:
        self._jax_devices = list(jax.devices())
        self.devices = [_info_from_device(d, i) for i, d in enumerate(self._jax_devices)]
        return self.devices

    def get_primary_gpu(self) -> Optional[DeviceInfo]:
        """Primary selection: discrete accelerators first (detector.rs:136-164's
        discrete>NVIDIA>AMD>Intel ladder collapses to TPU>GPU>CPU here)."""
        if not self.devices:
            self.detect_gpus()
        order = {"tpu": 0, "gpu": 1, "cpu": 2}
        return min(self.devices, key=lambda d: order.get(d.platform, 3), default=None)

    def get_primary_device(self):
        """The actual `jax.Device` backing the primary DeviceInfo."""
        info = self.get_primary_gpu()
        if info is None:
            return None
        order = {"tpu": 0, "gpu": 1, "cpu": 2}
        return min(
            self._jax_devices,
            key=lambda d: order.get(d.platform, 3),
        )

    def determine_best_upscaling_technology(self) -> str:
        """detector.rs:177-207 vendor→tech ladder mapped to kernel families:
        any real accelerator → "wgpu" (the Pallas/XLA path); CPU-only →
        "fallback"."""
        primary = self.get_primary_gpu()
        if primary is None or primary.platform == "cpu":
            return "fallback"
        return "wgpu"

    def detect_technologies(self) -> dict:
        """Availability map per technology string — the role of the legacy
        library-detection mocks (`Nu_scale/src/upscale/dlss.rs:14-398`,
        `xess.rs:31-352`, `vulkan.rs`: probe for vendor SDKs/DLLs and report
        a mock context). Here:
          wgpu     — the Pallas/XLA resample path; any device
          fsr      — EASU+RCAS pipeline; any device
          dlss     — the learned tier; available iff a trained checkpoint
                     exists (the SDK-presence probe's analog)
          xess     — Intel SDK: never present on this platform
          vulkan   — no Vulkan on TPU hosts
          fallback — always
        """
        learned = False
        try:
            from nu_scaler_tpu.models.train import load_checkpoint

            learned = any(
                load_checkpoint(1, arch) is not None for arch in ("tpu4", "tpu", "lite")
            )
        except Exception:  # noqa: BLE001
            pass
        return {
            "wgpu": True,
            "fsr": True,
            "dlss": learned,
            "xess": False,
            "vulkan": False,
            "fallback": True,
        }


@functools.lru_cache(maxsize=1)
def detect() -> DeviceDetector:
    d = DeviceDetector()
    d.detect_gpus()
    return d
