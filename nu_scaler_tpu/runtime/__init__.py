"""Runtime services: device detection, HBM memory accounting, streaming.

TPU-native replacement for the reference's GPU runtime layer
(`nu_scaler_core/src/gpu/{detector,memory,mod}.rs`).
"""

from nu_scaler_tpu.runtime.detector import DeviceDetector, DeviceInfo, detect
from nu_scaler_tpu.runtime.memory import (
    AllocationStrategy,
    MemoryPool,
    MemoryPressure,
    VramStats,
)

__all__ = [
    "DeviceDetector",
    "DeviceInfo",
    "detect",
    "AllocationStrategy",
    "MemoryPool",
    "MemoryPressure",
    "VramStats",
]
