"""Headless live pipeline — the engine behind the reference's
`LiveFeedScreen.update_frame` loop (main.py:951-1177, SURVEY §3.3), minus Qt.

Per tick: drain capture to the latest frame → optional frame interpolation
(prev, cur) → upscale → deliver to a sink callback. Includes the aux
behaviors SURVEY §5 catalogs:

  * FPS EMA with 0.95/0.05 smoothing (main.py:1128-1163)
  * watchdog/heartbeat liveness logging (main.py:343-374)
  * re-init of the upscaler on size/scale change (main.py:1042-1071)
  * upscaler reset on worker error (main.py:1179-1187)
  * one frame in flight at a time is replaced by the double-buffered
    device pipeline (SURVEY §2.6 TPU equivalents table)
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional

import numpy as np

import nu_scaler_core
from nu_scaler.logger import init_logger


class LiveSession:
    def __init__(
        self,
        scale: float = 2.0,
        algorithm: str = "lanczos3",
        quality: str = "quality",
        technology: str = "wgpu",
        interpolation: bool = False,
        interpolation_mode: str = "blend",
        target: Optional[object] = None,
        window: Optional[object] = None,
        region: Optional[object] = None,
        sink: Optional[Callable[[bytes, int, int], None]] = None,
        fps: float = 60.0,
    ) -> None:
        self.log = init_logger()
        self.scale = scale
        self.algorithm = algorithm
        self.quality = quality
        self.technology = (technology or "wgpu").lower()
        self.interpolation = interpolation
        self.interpolation_mode = interpolation_mode
        self.sink = sink or (lambda data, w, h: None)
        self.capture = nu_scaler_core.PyScreenCapture()
        self.target = target or nu_scaler_core.PyCaptureTarget.FullScreen
        # window/region ride along to capture.start — the WindowByTitle /
        # Region targets of the reference live loop (main.py:733, lib.rs:298)
        self.window = window
        self.region = region
        self.upscaler: Optional[nu_scaler_core.PyWgpuUpscaler] = None
        self.interpolator = (
            nu_scaler_core.WgpuFrameInterpolator(mode=interpolation_mode)
            if interpolation
            else None
        )
        self.fps_target = fps

        self._in_size: Optional[tuple[int, int]] = None
        self._prev_frame: Optional[bytes] = None
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._last_heartbeat = time.monotonic()

        # stats
        self.frames_in = 0
        self.frames_out = 0
        self.fps_ema = 0.0
        self.last_frame_ms = 0.0
        self.errors = 0

    # -- lifecycle --------------------------------------------------------

    def start(self) -> "LiveSession":
        self.capture.start(self.target, self.window, self.region)
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, name="nu-live", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=3.0)
            self._thread = None
        self.capture.stop()

    # -- loop -------------------------------------------------------------

    def _ensure_upscaler(self, w: int, h: int) -> None:
        if self.upscaler is not None and self._in_size == (w, h):
            return
        out_w, out_h = int(w * self.scale), int(h * self.scale)
        self.log.info(
            "init upscaler %dx%d -> %dx%d (%s/%s)",
            w, h, out_w, out_h, self.technology, self.algorithm,
        )
        # per-technology upscaler selection (main.py:888-949's combo-box →
        # DlssUpscaler/PyWgpuUpscaler wiring): fsr → EASU+RCAS, dlss → the
        # learned ultra tier, wgpu/fallback → classical kernels
        if self.technology == "fsr":
            self.upscaler = nu_scaler_core.create_fsr_upscaler(self.quality)
        elif self.technology == "dlss":
            self.upscaler = nu_scaler_core.PyAdvancedWgpuUpscaler(
                "ultra", self.algorithm, True
            )
            if self.quality in ("performance", "balanced"):
                # requested speed over fidelity: the fast stride-8 learned
                # ladder (same mapping as the NuScaler facade)
                self.upscaler.learned_prefer = "performance"
        else:
            self.upscaler = nu_scaler_core.PyWgpuUpscaler(self.quality, self.algorithm)
        self.upscaler.initialize(w, h, out_w, out_h)
        self._in_size = (w, h)
        self._prev_frame = None

    def _tick(self) -> None:
        got = self.capture.get_frame()
        if got is None:
            return
        data, w, h = got
        self.frames_in += 1
        t0 = time.perf_counter()
        try:
            self._ensure_upscaler(w, h)
            frames_to_emit = []
            if self.interpolator is not None and self._prev_frame is not None:
                mid = self.interpolator.interpolate_py(self._prev_frame, data, w, h, time_t=0.5)
                frames_to_emit.append(mid)
            frames_to_emit.append(data)
            self._prev_frame = data
            for f in frames_to_emit:
                out = self.upscaler.upscale(f)
                self.sink(out, int(w * self.scale), int(h * self.scale))
                self.frames_out += 1
        except Exception as e:  # noqa: BLE001 — reset on worker error (main.py:1179-1187)
            self.errors += 1
            self.log.error("pipeline error, resetting upscaler: %s", e)
            self.upscaler = None
            self._in_size = None
            return
        dt_ms = (time.perf_counter() - t0) * 1000.0
        self.last_frame_ms = dt_ms
        inst_fps = 1000.0 / dt_ms if dt_ms > 0 else 0.0
        self.fps_ema = 0.95 * self.fps_ema + 0.05 * inst_fps if self.fps_ema else inst_fps

    def _run(self) -> None:
        interval = 1.0 / self.fps_target if self.fps_target > 0 else 0.0
        while not self._stop.is_set():
            t0 = time.monotonic()
            self._tick()
            if t0 - self._last_heartbeat > 5.0:  # heartbeat (main.py:343-374)
                self._last_heartbeat = t0
                self.log.info(
                    "[heartbeat] in=%d out=%d fps=%.1f err=%d",
                    self.frames_in, self.frames_out, self.fps_ema, self.errors,
                )
            dt = time.monotonic() - t0
            if interval > dt:
                self._stop.wait(interval - dt)

    # -- overlay stats (main.py:1128-1163 role) ---------------------------

    def stats(self) -> dict:
        return {
            "frames_in": self.frames_in,
            "frames_out": self.frames_out,
            "fps": round(self.fps_ema, 1),
            "last_frame_ms": round(self.last_frame_ms, 2),
            "errors": self.errors,
            "input_size": self._in_size,
            "scale": self.scale,
            "algorithm": self.algorithm,
            "technology": self.technology,
            "interpolation": self.interpolation,
        }
