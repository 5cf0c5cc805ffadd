"""Toolkit-free view-models for the GUI screen set.

The reference ships a six-screen PySide6 app (`nu_scaler_py/nu_scaler/
main.py`: `LiveFeedScreen` :278-355, `SettingsScreen`, `DebugScreen`,
`AdvancedScreen`, `BenchmarkScreen`, `UIAccessibilityScreen`, `MainWindow`
:1956+; display modes and overlay stats :610-767, 1128-1163). PySide6 is not
installed in this environment, so every screen's STATE AND LOGIC lives here,
Qt-free and fully testable headless; `nu_scaler.gui` is a thin widget layer
over these models when PySide6 exists.
"""

from __future__ import annotations

import collections
import logging
import threading
from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, List, Optional

from nu_scaler.hotkeys import HotkeyAction, HotkeyManager
from nu_scaler.logger import init_logger
from nu_scaler.profiles import Profile


class DisplayMode(Enum):
    """LiveFeedScreen display modes (main.py:610-767)."""

    EMBEDDED = "embedded"
    FULLSCREEN = "fullscreen"
    CORNER_OVERLAY = "corner_overlay"


# ---------------------------------------------------------------------------
# Settings
# ---------------------------------------------------------------------------


QUALITIES = ["ultra", "quality", "balanced", "performance"]
ALGORITHMS = ["nearest", "bilinear", "bicubic", "lanczos2", "lanczos3", "mitchell", "area"]
TECHNOLOGIES = ["wgpu", "fsr", "dlss", "fallback"]
SOURCES = ["synthetic", "fullscreen", "window", "region"]
INTERP_MODES = ["blend", "flow", "flow_soft", "flow_soft_ref"]


class SettingsModel:
    """SettingsScreen state: validated engine settings + profile persistence
    (the reference's combo boxes → init_upscaler wiring, main.py:888-949)."""

    def __init__(self, profile: Optional[Profile] = None):
        p = profile or Profile()
        self.quality = p.quality
        self.algorithm = p.algorithm
        self.technology = p.technology
        self.scale = p.scale
        self.fps = p.fps
        self.source = p.source
        self.interpolation = p.interpolation
        self.interpolation_mode = p.interpolation_mode
        self._dirty = False
        self._listeners: List[Callable[[str, object], None]] = []

    def subscribe(self, fn: Callable[[str, object], None]) -> None:
        self._listeners.append(fn)

    def _set(self, name: str, value) -> None:
        object.__setattr__(self, name, value)
        self._dirty = True
        for fn in self._listeners:
            fn(name, value)

    # validated setters (silent fallback defaults, lib.rs:50-62 style)
    def set_quality(self, q: str) -> None:
        self._set("quality", q if q in QUALITIES else "quality")

    def set_algorithm(self, a: str) -> None:
        self._set("algorithm", a if a in ALGORITHMS else "bilinear")

    def set_technology(self, t: str) -> None:
        self._set("technology", t if t in TECHNOLOGIES else "wgpu")

    def set_scale(self, s: float) -> None:
        if not 1.0 <= float(s) <= 4.0:
            raise ValueError("Scale factor must be between 1.0 and 4.0")
        self._set("scale", float(s))

    def set_fps(self, fps: int) -> None:
        self._set("fps", max(1, min(240, int(fps))))

    def set_source(self, src: str) -> None:
        base = src.split(":", 1)[0]
        self._set("source", src if base in SOURCES else "synthetic")

    def set_interpolation(self, on: bool, mode: str = None) -> None:
        self._set("interpolation", bool(on))
        if mode is not None:
            self._set("interpolation_mode", mode if mode in INTERP_MODES else "blend")

    @property
    def dirty(self) -> bool:
        return self._dirty

    # profile persistence (Profile role, ui/profile.rs:87-232)
    def to_profile(self, name: str = "default") -> Profile:
        return Profile(
            name=name,
            source=self.source,
            technology=self.technology,
            quality=self.quality,
            algorithm=self.algorithm,
            fps=self.fps,
            scale=self.scale,
            interpolation=self.interpolation,
            interpolation_mode=self.interpolation_mode,
        )

    def save_profile(self, name: str = "default") -> str:
        self._dirty = False
        return self.to_profile(name).save()

    def load_profile(self, name: str) -> None:
        p = Profile.load(name)
        self.set_source(p.source)
        self.set_technology(p.technology)
        self.set_quality(p.quality)
        self.set_algorithm(p.algorithm)
        self.set_fps(p.fps)
        self.set_scale(p.scale)
        self.set_interpolation(p.interpolation, p.interpolation_mode)
        self._dirty = False


# ---------------------------------------------------------------------------
# Live feed
# ---------------------------------------------------------------------------


class LiveFeedModel:
    """LiveFeedScreen logic: session control, display mode, overlay stats
    lines, captured-frame snapshots (main.py:278-355, 951-1177)."""

    def __init__(self, settings: SettingsModel, session_factory=None):
        self.settings = settings
        self.display_mode = DisplayMode.EMBEDDED
        self.overlay_visible = True
        self.session = None
        self.latest_frame: Optional[tuple] = None  # (bytes, w, h)
        self.snapshot: Optional[tuple] = None
        self._factory = session_factory or self._default_factory

    @staticmethod
    def _default_factory(settings: SettingsModel, sink):
        from nu_scaler.live import LiveSession

        return LiveSession(
            scale=settings.scale,
            algorithm=settings.algorithm,
            quality=settings.quality,
            technology=settings.technology,
            interpolation=settings.interpolation,
            interpolation_mode=settings.interpolation_mode,
            sink=sink,
            fps=settings.fps,
        )

    @property
    def running(self) -> bool:
        return self.session is not None

    def _sink(self, data: bytes, w: int, h: int) -> None:
        self.latest_frame = (data, w, h)

    def start(self) -> None:
        if self.session is None:
            self.session = self._factory(self.settings, self._sink)
            self.session.start()

    def stop(self) -> None:
        if self.session is not None:
            self.session.stop()
            self.session = None

    def toggle_capture(self) -> bool:
        """Hotkey/button entry; returns the new running state."""
        (self.stop if self.running else self.start)()
        return self.running

    def capture_frame(self) -> Optional[tuple]:
        """CaptureFrame hotkey: snapshot the most recent output frame."""
        self.snapshot = self.latest_frame
        return self.snapshot

    def toggle_overlay(self) -> bool:
        self.overlay_visible = not self.overlay_visible
        return self.overlay_visible

    def set_display_mode(self, mode: str | DisplayMode) -> DisplayMode:
        self.display_mode = DisplayMode(mode) if isinstance(mode, str) else mode
        return self.display_mode

    def cycle_display_mode(self) -> DisplayMode:
        order = list(DisplayMode)
        idx = (order.index(self.display_mode) + 1) % len(order)
        self.display_mode = order[idx]
        return self.display_mode

    def overlay_lines(self) -> List[str]:
        """The overlay stat label set (main.py:1128-1163)."""
        if self.session is None:
            return ["stopped"]
        s = self.session.stats()
        lines = [
            f"FPS: {s['fps']:.1f}",
            f"frame: {s['last_frame_ms']:.2f} ms",
            f"in/out: {s['frames_in']}/{s['frames_out']}",
            f"{s['algorithm']} x{s['scale']}",
        ]
        if s.get("input_size"):
            w, h = s["input_size"]
            lines.append(f"{w}x{h} → {int(w * s['scale'])}x{int(h * s['scale'])}")
        if s["errors"]:
            lines.append(f"errors: {s['errors']}")
        return lines


# ---------------------------------------------------------------------------
# Debug (log console)
# ---------------------------------------------------------------------------


class DebugModel(logging.Handler):
    """DebugScreen state: a bounded in-memory log console fed straight from
    the `nu_scaler` logger (the reference's log_signal → console,
    main.py:275, 1464-1475), with level filtering and save-to-file."""

    def __init__(self, capacity: int = 1000, level: int = logging.DEBUG):
        super().__init__(level)
        self.records: collections.deque = collections.deque(maxlen=capacity)
        self.min_level = logging.INFO
        self.setFormatter(
            logging.Formatter("%(asctime)s [%(levelname)s] %(message)s", datefmt="%H:%M:%S")
        )
        init_logger().addHandler(self)

    def emit(self, record: logging.LogRecord) -> None:  # logging.Handler hook
        self.records.append((record.levelno, self.format(record)))

    def lines(self, level: Optional[int] = None) -> List[str]:
        lvl = self.min_level if level is None else level
        return [text for levelno, text in self.records if levelno >= lvl]

    def set_min_level(self, level: int) -> None:
        self.min_level = level

    def clear(self) -> None:
        self.records.clear()

    def save(self, path: str) -> int:
        lines = self.lines(logging.DEBUG)
        with open(path, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        return len(lines)

    def close(self) -> None:
        try:
            init_logger().removeHandler(self)
        finally:
            super().close()


# ---------------------------------------------------------------------------
# Advanced (GPU/memory controls)
# ---------------------------------------------------------------------------


class AdvancedModel:
    """AdvancedScreen: memory strategy, adaptive quality, VRAM stats and
    cleanup on a live advanced upscaler (main.py's VRAM labels every 2 s,
    :863-886, + PyAdvancedWgpuUpscaler knobs lib.rs:336-729)."""

    STRATEGIES = ["aggressive", "balanced", "conservative", "minimal"]

    def __init__(self, upscaler=None):
        self._ups = upscaler
        self.memory_strategy = "balanced"
        self.adaptive_quality = True
        self.buffer_pool_size = 3
        self.thread_count = 4
        self.last_stats: Optional[dict] = None

    def attach(self, upscaler) -> None:
        self._ups = upscaler

    def _ensure(self):
        if self._ups is None:
            import nu_scaler_core

            self._ups = nu_scaler_core.create_advanced_upscaler("quality")
        return self._ups

    def set_memory_strategy(self, s: str) -> None:
        if s not in self.STRATEGIES:
            s = "balanced"
        self.memory_strategy = s
        self._ensure().set_memory_strategy(s)

    def set_adaptive_quality(self, on: bool) -> None:
        self.adaptive_quality = bool(on)
        self._ensure().adaptive_quality = bool(on)

    def set_buffer_pool_size(self, n: int) -> None:
        self.buffer_pool_size = max(1, int(n))
        self._ensure().set_buffer_pool_size(self.buffer_pool_size)

    def set_thread_count(self, n: int) -> None:
        self.thread_count = max(1, int(n))
        self._ensure().set_thread_count(self.thread_count)

    def force_activation(self) -> None:
        self._ensure().force_gpu_activation()

    def cleanup_memory(self) -> None:
        self._ensure().cleanup_memory()

    def refresh(self) -> dict:
        """The 2-second VRAM poll tick."""
        ups = self._ensure()
        ups.update_gpu_stats()
        s = ups.get_vram_stats()
        self.last_stats = {
            "total_mb": s.total_mb,
            "used_mb": s.used_mb,
            "free_mb": s.free_mb,
            "usage_percent": s.usage_percent,
        }
        return self.last_stats

    def vram_label(self) -> str:
        if self.last_stats is None:
            self.refresh()
        s = self.last_stats
        return f"VRAM: {s['used_mb']:.0f}/{s['total_mb']:.0f} MB ({s['usage_percent']:.0f}%)"

    def gpu_info(self) -> dict:
        return self._ensure().get_gpu_info()


# ---------------------------------------------------------------------------
# Benchmark
# ---------------------------------------------------------------------------


@dataclass
class BenchmarkRun:
    running: bool = False
    progress: str = ""
    results: list = field(default_factory=list)
    error: Optional[str] = None


class BenchmarkModel:
    """BenchmarkScreen: run single/comparison benchmarks on a worker thread,
    expose rows + CSV export (BenchmarkScreen role; harness = P3/P4)."""

    def __init__(self):
        self.state = BenchmarkRun()
        self._thread: Optional[threading.Thread] = None

    def rows(self) -> List[dict]:
        return [
            {
                "technology": r.technology,
                "quality": r.quality,
                "fps": round(r.fps, 1),
                "avg_frame_time_ms": round(r.avg_frame_time_ms, 3),
            }
            for r in self.state.results
        ]

    def _work(self, mode: str, kwargs: dict) -> None:
        from nu_scaler import benchmark as B

        try:
            if mode == "single":
                self.state.progress = "running single"
                self.state.results = [B.run_benchmark(**kwargs)]
            else:
                self.state.progress = "running comparison"
                self.state.results = B.run_comparison_benchmark(**kwargs)
            self.state.progress = "done"
        except Exception as e:  # noqa: BLE001 — surfaced to the screen
            self.state.error = str(e)
            self.state.progress = "error"
        finally:
            self.state.running = False

    def start(self, mode: str = "single", wait: bool = False, **kwargs) -> None:
        if self.state.running:
            raise RuntimeError("benchmark already running")
        self.state = BenchmarkRun(running=True)
        self._thread = threading.Thread(
            target=self._work, args=(mode, kwargs), daemon=True
        )
        self._thread.start()
        if wait:
            self._thread.join()

    def wait(self, timeout: Optional[float] = None) -> bool:
        if self._thread is not None:
            self._thread.join(timeout)
        return not self.state.running

    def export_csv(self, path: str) -> str:
        from nu_scaler import benchmark as B

        B.export_csv(self.state.results, path)
        return path


# ---------------------------------------------------------------------------
# Accessibility
# ---------------------------------------------------------------------------


class AccessibilityModel:
    """UIAccessibilityScreen: font scale / theme / reduced-motion persisted
    with the profile config (main.py:1603-1610 theme save/load role)."""

    THEMES = ["dark", "light", "high_contrast"]

    def __init__(self):
        self.font_scale = 1.0
        self.theme = "dark"
        self.reduced_motion = False

    def set_font_scale(self, s: float) -> None:
        self.font_scale = min(3.0, max(0.5, float(s)))

    def set_theme(self, theme: str) -> None:
        self.theme = theme if theme in self.THEMES else "dark"

    def set_reduced_motion(self, on: bool) -> None:
        self.reduced_motion = bool(on)

    def to_dict(self) -> dict:
        return {
            "font_scale": self.font_scale,
            "theme": self.theme,
            "reduced_motion": self.reduced_motion,
        }

    def save(self) -> str:
        import json
        import os

        from nu_scaler.profiles import config_dir

        p = os.path.join(config_dir(), "ui.json")
        with open(p, "w") as f:
            json.dump(self.to_dict(), f, indent=2)
        return p

    def load(self) -> "AccessibilityModel":
        import json
        import os

        from nu_scaler.profiles import config_dir

        p = os.path.join(config_dir(), "ui.json")
        if os.path.exists(p):
            with open(p) as f:
                d = json.load(f)
            self.set_font_scale(d.get("font_scale", 1.0))
            self.set_theme(d.get("theme", "dark"))
            self.set_reduced_motion(d.get("reduced_motion", False))
        return self


# ---------------------------------------------------------------------------
# File preview (modern_gui PreviewPane role)
# ---------------------------------------------------------------------------


class PreviewModel:
    """Original/processed image-pair preview fed by drag-drop or a file
    dialog — the modern_gui `PreviewPane` flow (modern_gui.py:553-1020:
    fileDropped/fileSelected → process → paired panes). Qt-free: the widget
    layer forwards dropped/selected paths to `load_file`, which runs the
    CURRENT settings' upscaler on the image and exposes both frames as
    (bytes, w, h)."""

    EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".gif")

    def __init__(self, settings: SettingsModel):
        self.settings = settings
        self.original: Optional[tuple] = None  # (rgba_bytes, w, h)
        self.processed: Optional[tuple] = None
        self.file_path: Optional[str] = None
        self.error: Optional[str] = None

    def accepts(self, path: str) -> bool:
        """The drag-enter filter (modern_gui.py:940-947, 975-977)."""
        return path.lower().endswith(self.EXTENSIONS)

    def load_file(self, path: str) -> bool:
        """Load + process one image through the configured upscaler.
        Returns True on success; failures land in `self.error` (the pane
        shows them instead of crashing the shell)."""
        self.error = None
        if not self.accepts(path):
            self.error = f"unsupported file type: {path}"
            return False
        try:
            from PIL import Image

            import nu_scaler_core as nsc

            img = Image.open(path).convert("RGBA")
            w, h = img.size
            data = img.tobytes()
            s = self.settings
            out_w = max(1, int(w * s.scale))
            out_h = max(1, int(h * s.scale))
            up = nsc.PyWgpuUpscaler(s.quality, s.algorithm)
            up.initialize(w, h, out_w, out_h)
            out = up.upscale(data)
            self.original = (data, w, h)
            self.processed = (out, out_w, out_h)
            self.file_path = path
            return True
        except Exception as e:  # noqa: BLE001 — surfaced to the pane
            self.error = str(e)
            return False

    def reset(self) -> None:
        self.original = self.processed = self.file_path = None
        self.error = None


# ---------------------------------------------------------------------------
# Interpolation tuning dialog (modern_gui InterpolationDialog role)
# ---------------------------------------------------------------------------


class InterpolationTuningModel:
    """Advanced interpolation settings — the modern_gui
    `InterpolationDialog` (modern_gui.py:1572-2000): mode, pyramid levels,
    Horn–Schunck iteration counts, warp workgroup preset. `apply()`
    validates, pushes the mode into the live SettingsModel and returns the
    dict the dialog's settingsApplied signal would carry."""

    PRESETS = ["8x8", "16x16", "32x8", "8x32"]

    def __init__(self, settings: SettingsModel):
        self.settings = settings
        self.mode = settings.interpolation_mode
        self.levels = 4
        self.coarse_iters = 32
        self.refine_iters = 8
        self.workgroup_preset = "16x16"
        self.applied: Optional[dict] = None

    def set_mode(self, mode: str) -> None:
        self.mode = mode if mode in INTERP_MODES else "blend"

    def set_levels(self, n: int) -> None:
        self.levels = min(6, max(1, int(n)))

    def set_coarse_iters(self, n: int) -> None:
        self.coarse_iters = min(128, max(1, int(n)))

    def set_refine_iters(self, n: int) -> None:
        self.refine_iters = min(64, max(0, int(n)))

    def set_workgroup_preset(self, p: str) -> None:
        self.workgroup_preset = p if p in self.PRESETS else "16x16"

    def to_dict(self) -> dict:
        return {
            "mode": self.mode,
            "levels": self.levels,
            "coarse_iters": self.coarse_iters,
            "refine_iters": self.refine_iters,
            "workgroup_preset": self.workgroup_preset,
        }

    def apply(self) -> dict:
        self.settings.set_interpolation(self.settings.interpolation, self.mode)
        self.applied = self.to_dict()
        return self.applied

    def make_interpolator(self):
        """Build the configured interpolator (the dialog's preview hook)."""
        import nu_scaler_core as nsc

        return nsc.create_interpolator(self.mode, self.workgroup_preset)


# ---------------------------------------------------------------------------
# Main window
# ---------------------------------------------------------------------------


class MainWindowModel:
    """Screen registry + navigation + hotkey wiring (MainWindow role,
    main.py:1956+; the preview screen consolidates modern_gui's PreviewPane
    flow into the same shell)."""

    SCREENS = [
        "live", "settings", "preview", "debug", "advanced", "benchmark",
        "accessibility",
    ]

    def __init__(self, session_factory=None):
        self.settings = SettingsModel()
        self.live = LiveFeedModel(self.settings, session_factory=session_factory)
        self.debug = DebugModel()
        self.advanced = AdvancedModel()
        self.benchmark = BenchmarkModel()
        self.preview = PreviewModel(self.settings)
        self.interp_tuning = InterpolationTuningModel(self.settings)
        self.accessibility = AccessibilityModel().load()
        self.current_screen = "live"
        self.quit_requested = False

        self.hotkeys = HotkeyManager()
        self.hotkeys.register_defaults()
        self.hotkeys.on(HotkeyAction.TOGGLE_CAPTURE, lambda: self.live.toggle_capture())
        self.hotkeys.on(HotkeyAction.CAPTURE_FRAME, lambda: self.live.capture_frame())
        self.hotkeys.on(HotkeyAction.TOGGLE_OVERLAY, lambda: self.live.toggle_overlay())
        self.hotkeys.on(HotkeyAction.QUIT, self.request_quit)

    def navigate(self, screen: str) -> str:
        if screen not in self.SCREENS:
            raise ValueError(f"unknown screen: {screen}")
        self.current_screen = screen
        return screen

    def request_quit(self) -> None:
        self.quit_requested = True
        self.live.stop()

    def shutdown(self) -> None:
        self.request_quit()
        self.hotkeys.stop()
        self.debug.close()
