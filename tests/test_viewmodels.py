"""GUI screen view-models + hotkeys, tested headless (PySide6 absent in this
environment — the models ARE the screens' state/logic; main.py:278+ roles)."""

import logging

import pytest

from nu_scaler.hotkeys import (
    DEFAULT_BINDINGS,
    Hotkey,
    HotkeyAction,
    HotkeyManager,
    parse_hotkey,
)
from nu_scaler.viewmodels import (
    AccessibilityModel,
    AdvancedModel,
    BenchmarkModel,
    DebugModel,
    DisplayMode,
    LiveFeedModel,
    MainWindowModel,
    SettingsModel,
)


# ---------------------------------------------------------------------------
# hotkeys (hotkeys.rs:10-231 roles)
# ---------------------------------------------------------------------------


def test_parse_hotkey_formats():
    hk = parse_hotkey("Ctrl+Alt+C")
    assert hk == Hotkey(frozenset({"ctrl", "alt"}), "c")
    assert parse_hotkey("esc") == Hotkey(frozenset(), "escape")
    assert parse_hotkey("cmd+f5").modifiers == frozenset({"super"})
    with pytest.raises(ValueError):
        parse_hotkey("ctrl+bogus_key")
    with pytest.raises(ValueError):
        parse_hotkey("notamod+c")
    with pytest.raises(ValueError):
        parse_hotkey("")


def test_hotkey_manager_dispatch():
    mgr = HotkeyManager(backend="synthetic")
    fired = []
    mgr.register("ctrl+alt+c", HotkeyAction.TOGGLE_CAPTURE, lambda: fired.append("t"))
    # inject with different case/order normalizes to the same combo
    assert mgr.inject("alt+ctrl+C") is HotkeyAction.TOGGLE_CAPTURE
    assert fired == ["t"]
    assert mgr.poll() is HotkeyAction.TOGGLE_CAPTURE
    assert mgr.poll() is None
    assert mgr.inject("ctrl+alt+x") is None  # unbound
    assert mgr.unregister("ctrl+alt+c")
    assert mgr.inject("ctrl+alt+c") is None


def test_hotkey_defaults_cover_reference_actions():
    mgr = HotkeyManager(backend="synthetic")
    mgr.register_defaults()
    assert set(mgr.bindings().values()) == {a.value for a in HotkeyAction}
    assert set(DEFAULT_BINDINGS) == set(HotkeyAction)


# ---------------------------------------------------------------------------
# settings
# ---------------------------------------------------------------------------


def test_settings_validation_and_fallbacks():
    s = SettingsModel()
    s.set_quality("BOGUS")
    assert s.quality == "quality"  # silent fallback (lib.rs:50-62 style)
    s.set_algorithm("lanczos3")
    assert s.algorithm == "lanczos3"
    with pytest.raises(ValueError):
        s.set_scale(5.0)
    s.set_scale(3.0)
    assert s.scale == 3.0
    s.set_fps(1000)
    assert s.fps == 240
    assert s.dirty


def test_settings_profile_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    s = SettingsModel()
    s.set_algorithm("bicubic")
    s.set_scale(1.5)
    s.set_interpolation(True, "flow")
    s.save_profile("vmtest")
    assert not s.dirty
    s2 = SettingsModel()
    s2.load_profile("vmtest")
    assert s2.algorithm == "bicubic" and s2.scale == 1.5
    assert s2.interpolation and s2.interpolation_mode == "flow"


def test_settings_subscription():
    s = SettingsModel()
    seen = []
    s.subscribe(lambda k, v: seen.append((k, v)))
    s.set_quality("ultra")
    assert ("quality", "ultra") in seen


# ---------------------------------------------------------------------------
# live feed
# ---------------------------------------------------------------------------


class FakeSession:
    def __init__(self, sink):
        self.sink = sink
        self.started = False

    def start(self):
        self.started = True
        self.sink(b"\x01" * (4 * 4 * 4), 4, 4)
        return self

    def stop(self):
        self.started = False

    def stats(self):
        return {
            "frames_in": 3, "frames_out": 3, "fps": 60.0, "last_frame_ms": 1.0,
            "errors": 1, "input_size": (4, 4), "scale": 2.0,
            "algorithm": "lanczos3", "interpolation": False,
        }


def make_live():
    settings = SettingsModel()
    return LiveFeedModel(settings, session_factory=lambda s, sink: FakeSession(sink))


def test_live_toggle_and_snapshot():
    live = make_live()
    assert not live.running
    assert live.toggle_capture() is True
    assert live.running and live.latest_frame is not None
    snap = live.capture_frame()
    assert snap == live.latest_frame
    assert live.toggle_capture() is False
    assert not live.running


def test_live_display_modes_and_overlay():
    live = make_live()
    assert live.set_display_mode("fullscreen") is DisplayMode.FULLSCREEN
    assert live.cycle_display_mode() is DisplayMode.CORNER_OVERLAY
    assert live.cycle_display_mode() is DisplayMode.EMBEDDED
    assert live.overlay_lines() == ["stopped"]
    live.start()
    lines = live.overlay_lines()
    assert any("FPS" in ln for ln in lines)
    assert any("4x4" in ln for ln in lines)
    assert any("errors" in ln for ln in lines)
    assert live.toggle_overlay() is False
    live.stop()


# ---------------------------------------------------------------------------
# debug console
# ---------------------------------------------------------------------------


def test_debug_console_capture_and_filter(tmp_path):
    dbg = DebugModel(capacity=10)
    try:
        log = logging.getLogger("nu_scaler")
        log.debug("dbg-line")
        log.info("info-line")
        log.error("err-line")
        assert any("info-line" in ln for ln in dbg.lines())
        assert not any("dbg-line" in ln for ln in dbg.lines())  # INFO default
        assert any("dbg-line" in ln for ln in dbg.lines(logging.DEBUG))
        dbg.set_min_level(logging.ERROR)
        assert all("err-line" in ln for ln in dbg.lines())
        p = tmp_path / "console.log"
        n = dbg.save(str(p))
        assert n >= 3 and "err-line" in p.read_text()
        dbg.clear()
        assert dbg.lines(logging.DEBUG) == []
    finally:
        dbg.close()


# ---------------------------------------------------------------------------
# advanced
# ---------------------------------------------------------------------------


class FakeVram:
    total_mb, used_mb, free_mb, usage_percent, app_allocated_mb = 16000.0, 4000.0, 12000.0, 25.0, 1.0


class FakeUpscaler:
    def __init__(self):
        self.calls = []
        self.adaptive_quality = True

    def __getattr__(self, name):
        def rec(*a):
            self.calls.append((name, a))
            if name == "get_vram_stats":
                return FakeVram()
            if name == "get_gpu_info":
                return {"name": "TPU v5e"}
        return rec


def test_advanced_model_controls():
    ups = FakeUpscaler()
    a = AdvancedModel(ups)
    a.set_memory_strategy("aggressive")
    a.set_memory_strategy("bogus")
    assert a.memory_strategy == "balanced"
    a.set_adaptive_quality(False)
    assert ups.adaptive_quality is False
    a.set_buffer_pool_size(5)
    a.set_thread_count(8)
    a.force_activation()
    a.cleanup_memory()
    stats = a.refresh()
    assert stats["usage_percent"] == 25.0
    assert "VRAM: 4000/16000 MB (25%)" == a.vram_label()
    assert a.gpu_info()["name"] == "TPU v5e"
    names = [c[0] for c in ups.calls]
    for expected in ("set_memory_strategy", "set_buffer_pool_size", "set_thread_count",
                     "force_gpu_activation", "cleanup_memory", "update_gpu_stats"):
        assert expected in names


# ---------------------------------------------------------------------------
# benchmark
# ---------------------------------------------------------------------------


def test_benchmark_model_single(tmp_path):
    b = BenchmarkModel()
    b.start("single", wait=True, technology="wgpu", quality="performance",
            input_width=32, input_height=24, scale_factor=2.0, frame_count=1)
    assert b.state.error is None and b.state.progress == "done"
    rows = b.rows()
    assert len(rows) == 1 and rows[0]["fps"] > 0
    path = b.export_csv(str(tmp_path / "r.csv"))
    assert "fps" in open(path).read()
    with b_running(b):
        with pytest.raises(RuntimeError):
            b.start("single")


class b_running:
    """Temporarily mark a BenchmarkModel as running."""

    def __init__(self, b):
        self.b = b

    def __enter__(self):
        self.b.state.running = True

    def __exit__(self, *exc):
        self.b.state.running = False


# ---------------------------------------------------------------------------
# accessibility
# ---------------------------------------------------------------------------


def test_accessibility_clamps_and_persists(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    a = AccessibilityModel()
    a.set_font_scale(10.0)
    assert a.font_scale == 3.0
    a.set_theme("neon")
    assert a.theme == "dark"
    a.set_theme("high_contrast")
    a.set_reduced_motion(True)
    a.save()
    b = AccessibilityModel().load()
    assert b.theme == "high_contrast" and b.reduced_motion and b.font_scale == 3.0


# ---------------------------------------------------------------------------
# main window: navigation + hotkey wiring
# ---------------------------------------------------------------------------


def test_main_window_model(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    m = MainWindowModel(session_factory=lambda s, sink: FakeSession(sink))
    try:
        assert m.navigate("benchmark") == "benchmark"
        with pytest.raises(ValueError):
            m.navigate("nope")
        # hotkeys drive the live screen
        assert m.hotkeys.inject("ctrl+alt+c") is HotkeyAction.TOGGLE_CAPTURE
        assert m.live.running
        m.hotkeys.inject("ctrl+alt+s")
        assert m.live.snapshot is not None
        m.hotkeys.inject("ctrl+alt+o")
        assert m.live.overlay_visible is False
        m.hotkeys.inject("ctrl+alt+q")
        assert m.quit_requested and not m.live.running
    finally:
        m.shutdown()
