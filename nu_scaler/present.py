"""Presentation layer — the legacy fullscreen renderer's runtime behaviors
(`/root/reference/Nu_scale/src/renderer/fullscreen.rs`):

  * triple buffer between the processing thread and the presenter
    (`wgpu_renderer.rs:89-123`) — writer never blocks, reader takes latest
  * adaptive frame skipping against a frame-time budget, enabled only while
    measured FPS < 45 (`fullscreen.rs:706-728`)
  * FPS tracking with variance-adaptive smoothing (stable → 0.8, jittery →
    0.95, warm-up 0.9) and 120-sample history (`fullscreen.rs:741-775`)
  * single-instance lock file with stale-PID takeover (`fullscreen.rs:59-193`)

The actual blit is a callback (Qt pixmap, file writer, /dev/null sink…): on
this platform presentation is host-side; the TPU pipeline stays upstream.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable, List, Optional, Tuple

Frame = Tuple[bytes, int, int]


class TripleBuffer:
    """3-slot latest-wins frame exchange: the writer cycles slots it owns and
    publishes the freshest index; the reader borrows the published slot.
    Lock-light (one small lock around index swaps, never around copies)."""

    def __init__(self):
        self._slots: List[Optional[Frame]] = [None, None, None]
        self._latest = -1  # published slot index, -1 = nothing yet
        self._write = 0
        self._lock = threading.Lock()
        self.writes = 0
        self.reads = 0

    def write(self, frame: Frame) -> None:
        slot = self._write
        self._slots[slot] = frame
        with self._lock:
            self._latest = slot
            # next write goes to a slot that is neither the one just
            # published nor the one a reader may be holding
            self._write = (slot + 1) % 3
            self.writes += 1

    def read_latest(self) -> Optional[Frame]:
        with self._lock:
            idx = self._latest
            self.reads += 1
        return None if idx < 0 else self._slots[idx]


class AdaptiveFrameStats:
    """FPS + frame-budget bookkeeping (fullscreen.rs:706-790)."""

    def __init__(self, target_fps: float = 60.0, enable_frame_skipping: bool = True):
        self.frame_time_budget_ms = 1000.0 / target_fps
        self.enable_frame_skipping = enable_frame_skipping
        self.fps = 0.0
        self.fps_history: List[float] = []
        self.upscale_time_history: List[float] = []
        self.frames_presented = 0
        self.frames_skipped = 0
        self._last_t: Optional[float] = None

    def should_skip(self, elapsed_in_tick_s: float) -> bool:
        """Skip this update when adaptive skipping is active (user-enabled AND
        measured fps < 45) and the tick already burned >1/4 of the budget."""
        adaptive = (
            self.enable_frame_skipping and self.fps < 45.0
            if self.fps > 0.0
            else self.enable_frame_skipping
        )
        skip = adaptive and elapsed_in_tick_s * 1000.0 > self.frame_time_budget_ms / 4.0
        if skip:
            self.frames_skipped += 1
        return skip

    def _smooth_factor(self) -> float:
        if len(self.fps_history) > 10:
            mean = sum(self.fps_history) / len(self.fps_history)
            variance = sum((x - mean) ** 2 for x in self.fps_history) / len(self.fps_history)
            return 0.8 if variance < 5.0 else 0.95
        return 0.9

    def on_presented(self, upscale_time_ms: float = 0.0, now: Optional[float] = None) -> float:
        now = time.perf_counter() if now is None else now
        if self._last_t is not None:
            dt = max(now - self._last_t, 1e-4)
            current = 1.0 / dt
            sf = self._smooth_factor()
            self.fps = current if self.fps == 0.0 else self.fps * sf + current * (1.0 - sf)
            self.fps_history.append(self.fps)
            if len(self.fps_history) > 120:
                self.fps_history.pop(0)
        self._last_t = now
        self.upscale_time_history.append(upscale_time_ms)
        if len(self.upscale_time_history) > 120:
            self.upscale_time_history.pop(0)
        self.frames_presented += 1
        return self.fps


class SingleInstanceLock:
    """PID lock file with stale-process takeover (fullscreen.rs:59-193)."""

    def __init__(self, name: str = "nu_scaler_fullscreen"):
        base = os.environ.get("XDG_RUNTIME_DIR") or "/tmp"
        self.path = os.path.join(base, f"{name}.lock")
        self.held = False

    @staticmethod
    def _alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
            return True
        except (ProcessLookupError, PermissionError, ValueError):
            return False

    def acquire(self) -> bool:
        if os.path.exists(self.path):
            try:
                with open(self.path) as f:
                    pid = int(f.read().strip() or "0")
            except (OSError, ValueError):
                pid = 0
            if pid and pid != os.getpid() and self._alive(pid):
                return False  # live instance holds it
            os.unlink(self.path)  # stale — take over
        with open(self.path, "x") as f:
            f.write(str(os.getpid()))
        self.held = True
        return True

    def release(self) -> None:
        if self.held and os.path.exists(self.path):
            os.unlink(self.path)
        self.held = False

    def __enter__(self):
        if not self.acquire():
            raise RuntimeError("another NU Scaler presenter instance is running")
        return self

    def __exit__(self, *exc):
        self.release()
        return False


class FullscreenPresenter:
    """Presenter loop: drains a TripleBuffer at the target fps, applies the
    adaptive-skipping policy, and hands frames to a `blit` callback (the
    egui fullscreen-triangle role, fullscreen.rs:696-948)."""

    def __init__(
        self,
        blit: Callable[[bytes, int, int], None],
        target_fps: float = 60.0,
        enable_frame_skipping: bool = True,
        single_instance: bool = False,
    ):
        self.buffer = TripleBuffer()
        self.stats = AdaptiveFrameStats(target_fps, enable_frame_skipping)
        self.blit = blit
        self.target_fps = target_fps
        self._lock = SingleInstanceLock() if single_instance else None
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._presented_writes = -1

    # the LiveSession sink: runs on the processing thread, never blocks
    def submit(self, data: bytes, w: int, h: int) -> None:
        self.buffer.write((data, w, h))

    def start(self) -> "FullscreenPresenter":
        if self._lock is not None and not self._lock.acquire():
            raise RuntimeError("another NU Scaler presenter instance is running")
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, name="nu-present", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=3.0)
            self._thread = None
        if self._lock is not None:
            self._lock.release()

    def tick(self, tick_start: Optional[float] = None) -> bool:
        """One present step (exposed for tests / external loops). Returns
        True when a frame reached the blit callback."""
        t0 = time.perf_counter() if tick_start is None else tick_start
        if self.stats.should_skip(time.perf_counter() - t0):
            return False
        frame = self.buffer.read_latest()
        if frame is None or self.buffer.writes == self._presented_writes:
            return False  # nothing new
        t_blit = time.perf_counter()
        self.blit(*frame)
        self._presented_writes = self.buffer.writes
        self.stats.on_presented((time.perf_counter() - t_blit) * 1000.0)
        return True

    def _run(self) -> None:
        interval = 1.0 / self.target_fps if self.target_fps > 0 else 0.0
        while not self._stop.is_set():
            t0 = time.perf_counter()
            self.tick(t0)
            dt = time.perf_counter() - t0
            if interval > dt:
                self._stop.wait(interval - dt)

    def overlay_lines(self) -> List[str]:
        s = self.stats
        return [
            f"present FPS: {s.fps:.1f}",
            f"budget: {s.frame_time_budget_ms:.1f} ms",
            f"presented/skipped: {s.frames_presented}/{s.frames_skipped}",
        ]
