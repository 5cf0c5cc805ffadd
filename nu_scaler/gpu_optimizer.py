"""Device warm-up + monitoring + tuning — role of
`nu_scaler_py/nu_scaler/gpu_optimizer.py` (P5).

The reference "forces GPU activation" by pre-initializing upscalers at
FHD/2K/4K; on TPU the analog is paying compile + first-dispatch cost for the
common shapes up front so the live loop never hits a cold kernel.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import nu_scaler_core

WARM_SIZES = [(1920, 1080), (2560, 1440), (3840, 2160)]


def force_gpu_activation(scale: float = 2.0, algorithm: str = "bilinear") -> None:
    """Pre-compile the upscale kernels for the common resolutions
    (gpu_optimizer.py:8-41 role)."""
    import numpy as np

    for w, h in WARM_SIZES:
        up = nu_scaler_core.PyWgpuUpscaler("quality", algorithm)
        up.initialize(w, h, int(w * scale), int(h * scale))
        frame = np.zeros((h, w, 4), np.uint8)
        up.upscale(frame.tobytes())


class GpuMonitor:
    """Daemon thread printing HBM stats every `interval` seconds
    (gpu_optimizer.py:44-69 role). Stats come from the advanced upscaler's
    memory pool."""

    def __init__(self, upscaler=None, interval: float = 5.0, printer=print):
        self.upscaler = upscaler or nu_scaler_core.create_advanced_upscaler("balanced")
        self.interval = interval
        self.printer = printer
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.samples: list[float] = []

    def start(self) -> "GpuMonitor":
        self._thread = threading.Thread(target=self._run, name="nu-gpu-monitor", daemon=True)
        self._thread.start()
        return self

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                stats = self.upscaler.get_vram_stats()
                self.samples.append(stats.usage_percent)
                self.printer(
                    f"[GpuMonitor] HBM {stats.used_mb:.0f}/{stats.total_mb:.0f} MB "
                    f"({stats.usage_percent:.1f}%)"
                )
            except Exception as e:  # noqa: BLE001
                self.printer(f"[GpuMonitor] error: {e}")
            self._stop.wait(self.interval)

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)


def start_gpu_monitor(interval: float = 5.0) -> GpuMonitor:
    return GpuMonitor(interval=interval).start()


def optimize_upscaler(upscaler) -> None:
    """Apply the aggressive-memory + adaptive-quality preset
    (gpu_optimizer.py:72-93 role)."""
    try:
        upscaler.set_memory_strategy("aggressive")
        upscaler.adaptive_quality = True
        upscaler.force_gpu_activation()
    except AttributeError:
        pass  # plain PyWgpuUpscaler: nothing to tune
