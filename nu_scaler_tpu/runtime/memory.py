"""HBM memory accounting — the `MemoryPool`/`VramStats` role
(`nu_scaler_core/src/gpu/memory.rs:86-765`) over `jax.Device.memory_stats()`.

The reference tracks VRAM via DXGI/sysfs queries and pools wgpu buffers by
size. On TPU, XLA owns allocation; what remains meaningful is:

* **stats**: `memory_stats()` gives bytes_in_use / bytes_limit per chip — the
  exact analog of used/total VRAM, feeding the same pressure thresholds
  (Low<50% / Medium<75% / High<90% / Critical, memory.rs:328-341).
* **strategy**: Aggressive/Balanced/Conservative/Minimal becomes a policy for
  how many device-resident frame buffers the streaming path keeps in flight
  (the reference pre-allocates FHD/2K/4K triples when Aggressive,
  memory.rs:165-192).
* **cleanup**: drop cached device arrays + delete donated buffers.
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Optional

import jax


class MemoryPressure(enum.Enum):
    """Thresholds from memory.rs:328-341."""

    LOW = "Low"  # < 50 %
    MEDIUM = "Medium"  # < 75 %
    HIGH = "High"  # < 90 %
    CRITICAL = "Critical"  # >= 90 %

    @staticmethod
    def from_percent(pct: float) -> "MemoryPressure":
        if pct < 50.0:
            return MemoryPressure.LOW
        if pct < 75.0:
            return MemoryPressure.MEDIUM
        if pct < 90.0:
            return MemoryPressure.HIGH
        return MemoryPressure.CRITICAL


class AllocationStrategy(enum.Enum):
    """memory.rs:96-117; in-flight buffer counts for the streaming path."""

    AGGRESSIVE = "aggressive"
    BALANCED = "balanced"
    CONSERVATIVE = "conservative"
    MINIMAL = "minimal"

    @property
    def buffers_in_flight(self) -> int:
        return {
            AllocationStrategy.AGGRESSIVE: 3,
            AllocationStrategy.BALANCED: 2,
            AllocationStrategy.CONSERVATIVE: 2,
            AllocationStrategy.MINIMAL: 1,
        }[self]

    @staticmethod
    def parse(s: str) -> "AllocationStrategy":
        try:
            return AllocationStrategy((s or "").lower())
        except ValueError:
            return AllocationStrategy.BALANCED  # silent default, lib.rs:553-559


@dataclasses.dataclass
class VramStats:
    """Field parity with `VramStats`/`PyVramStats` (memory.rs:732-765)."""

    total_mb: float = 0.0
    used_mb: float = 0.0
    free_mb: float = 0.0
    app_allocated_mb: float = 0.0

    @property
    def usage_percent(self) -> float:
        return (self.used_mb / self.total_mb) * 100.0 if self.total_mb > 0 else 0.0


_MB = 1024.0 * 1024.0

# Fallback HBM sizes by device kind when memory_stats() is unavailable —
# the analog of the reference's name-based VRAM heuristic table
# (memory.rs:122-163, e.g. "4090"→24GB).
_HBM_HEURISTICS_GB = {
    "TPU v2": 8,
    "TPU v3": 16,
    "TPU v4": 32,
    "TPU v5 lite": 16,
    "TPU v5e": 16,
    "TPU v5p": 95,
    "TPU v6 lite": 32,
    "TPU v6e": 32,
}


def _device_memory_stats(device) -> Optional[dict]:
    try:
        return device.memory_stats()
    except Exception:
        return None


class MemoryPool:
    """Stats + policy holder (the wgpu buffer pooling itself is XLA's job).

    Keeps the reference's observable behavior: rate-limited stat refresh (5 s,
    memory.rs:604-612), pressure levels, strategy knob, allocated-buffer
    counters surfaced in `get_gpu_info()`.
    """

    STATS_REFRESH_S = 5.0

    def __init__(self, device=None, strategy: AllocationStrategy | None = None) -> None:
        if device is None:
            device = jax.devices()[0]
        self.device = device
        # vendor-derived default strategy (memory.rs:112-117): accelerators get
        # Aggressive, hosts Conservative.
        if strategy is None:
            strategy = (
                AllocationStrategy.AGGRESSIVE
                if device.platform in ("tpu", "gpu")
                else AllocationStrategy.CONSERVATIVE
            )
        self.strategy = strategy
        self._stats = VramStats()
        self._last_update = 0.0
        self._allocated_buffers = 0
        self._allocated_bytes = 0
        self._retained: dict = {}  # label -> device array (pre-allocation)
        self.update_vram_usage(force=True)

    # -- stats ------------------------------------------------------------

    def update_vram_usage(self, force: bool = False) -> VramStats:
        now = time.monotonic()
        if not force and (now - self._last_update) < self.STATS_REFRESH_S:
            return self._stats
        self._last_update = now
        ms = _device_memory_stats(self.device)
        if ms and ms.get("bytes_limit"):
            total = ms.get("bytes_limit", 0) / _MB
            used = ms.get("bytes_in_use", 0) / _MB
            app = ms.get("peak_bytes_in_use", ms.get("bytes_in_use", 0)) / _MB
        else:
            kind = getattr(self.device, "device_kind", "")
            total_gb = next(
                (v for k, v in _HBM_HEURISTICS_GB.items() if k.lower() in str(kind).lower()),
                8,
            )
            total = total_gb * 1024.0
            used = self._allocated_bytes / _MB
            app = used
        self._stats = VramStats(
            total_mb=float(total),
            used_mb=float(used),
            free_mb=float(max(total - used, 0.0)),
            app_allocated_mb=float(app),
        )
        return self._stats

    def get_vram_stats(self) -> VramStats:
        return self.update_vram_usage()

    def get_current_memory_pressure(self) -> MemoryPressure:
        return MemoryPressure.from_percent(self.get_vram_stats().usage_percent)

    # -- strategy / pool --------------------------------------------------

    def set_allocation_strategy(self, strategy: AllocationStrategy | str) -> None:
        if isinstance(strategy, str):
            strategy = AllocationStrategy.parse(strategy)
        self.strategy = strategy

    def get_allocated_buffers_count(self) -> int:
        return self._allocated_buffers + len(self._retained)

    def get_allocated_bytes(self) -> int:
        return self._allocated_bytes + sum(a.nbytes for a in self._retained.values())

    def retain(self, label: str, array) -> None:
        """Pin a device array (the analog of pool pre-allocation)."""
        self._retained[label] = array

    def note_alloc(self, nbytes: int) -> None:
        self._allocated_buffers += 1
        self._allocated_bytes += nbytes

    def force_gpu_usage(self) -> None:
        """Parity with `force_gpu_usage` (memory.rs:647-710): touch the device
        with a small allocation + computation so the first real frame doesn't
        pay cold-start latency. (The TPU analog of 'waking' the GPU is paying
        the compile + first-dispatch cost up front.)"""
        import jax.numpy as jnp

        x = jax.device_put(jnp.ones((256, 256), jnp.float32), self.device)
        (x @ x).block_until_ready()

    def cleanup_memory(self) -> None:
        """Drop retained buffers; `cleanup_memory` (gpu/mod.rs:117-137)."""
        self._retained.clear()
        self._allocated_buffers = 0
        self._allocated_bytes = 0
        self.update_vram_usage(force=True)
