"""Terminal UI (nu_scaler/tui.py) — the alternate-toolkit frontend over the
shared view-models (reference L8g egui/iced/gtk breadth + P6 simple_gui
launchers). Everything but the thin curses loop is pure and tested here."""

import os

import pytest

from nu_scaler import tui
from nu_scaler.viewmodels import MainWindowModel


class FakeSession:
    def __init__(self, sink):
        self.sink = sink

    def start(self):
        # a 4x4 horizontal luminance ramp frame
        px = bytearray()
        for y in range(4):
            for x in range(4):
                v = x * 85
                px += bytes((v, v, v, 255))
        self.sink(bytes(px), 4, 4)

    def stop(self):
        pass

    def stats(self):
        return {
            "frames_in": 2, "frames_out": 2, "fps": 59.9, "last_frame_ms": 1.2,
            "errors": 0, "input_size": (4, 4), "scale": 2.0,
            "algorithm": "lanczos3", "interpolation": False,
        }


@pytest.fixture()
def model(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path))
    m = MainWindowModel(session_factory=lambda s, sink: FakeSession(sink))
    yield m
    m.shutdown()


def test_ascii_preview_ramp():
    px = bytearray()
    for v in (0, 85, 170, 255):
        px += bytes((v, v, v, 255))
    lines = tui.ascii_preview((bytes(px), 4, 1), cols=4, rows=1)
    assert len(lines) == 1 and len(lines[0]) == 4
    # strictly brighter ramp → non-decreasing ramp indices, ends darker<brighter
    idx = [tui._RAMP.index(c) for c in lines[0]]
    assert idx == sorted(idx) and idx[0] < idx[-1]


def test_ascii_preview_degenerate():
    assert tui.ascii_preview(None, 10, 2) == ["(no frame)"]
    assert tui.ascii_preview((b"", 4, 4), 10, 2) == ["(bad frame)"]


def test_render_every_screen(model):
    for i, name in enumerate(model.SCREENS, start=1):
        assert tui.handle_key(model, str(i))
        assert model.current_screen == name
        lines = tui.render(model, width=60, height=18)
        assert lines, name
        assert all(len(ln) <= 60 for ln in lines), name
        assert f"{i}:{name[:3]}" in lines[0]  # compact labels at width 60


def test_live_screen_keys(model):
    tui.handle_key(model, "1")
    assert not model.live.running
    tui.handle_key(model, "s")
    assert model.live.running
    # the fake session pushed a frame → preview renders cells, overlay shows fps
    txt = "\n".join(tui.render(model, width=78, height=20))
    assert "RUNNING" in txt and "FPS: 59.9" in txt
    tui.handle_key(model, "c")
    assert model.live.snapshot is not None
    mode0 = model.live.display_mode
    tui.handle_key(model, "d")
    assert model.live.display_mode != mode0
    tui.handle_key(model, "o")
    assert "FPS:" not in "\n".join(tui.render(model, width=78, height=20))
    tui.handle_key(model, "s")
    assert not model.live.running


def test_settings_keys_cycle_and_clamp(model):
    tui.handle_key(model, "2")
    s = model.settings
    a0, q0, t0 = s.algorithm, s.quality, s.technology
    tui.handle_key(model, "a")
    tui.handle_key(model, "Q")
    tui.handle_key(model, "t")
    assert (s.algorithm, s.quality, s.technology) != (a0, q0, t0)
    for _ in range(20):
        tui.handle_key(model, "+")
    assert s.scale == 4.0
    for _ in range(20):
        tui.handle_key(model, "-")
    assert s.scale == 1.0
    tui.handle_key(model, "i")
    assert s.interpolation
    m0 = s.interpolation_mode
    tui.handle_key(model, "m")
    assert s.interpolation_mode != m0
    txt = "\n".join(tui.render_settings(model))
    assert "interp     : on" in txt


def test_settings_save_profile(model, tmp_path):
    tui.handle_key(model, "2")
    tui.handle_key(model, "w")
    assert not model.settings.dirty


def test_debug_keys(model):
    import logging

    from nu_scaler.logger import init_logger

    tui.handle_key(model, "4")
    init_logger().warning("tui-test-marker")
    assert any("tui-test-marker" in ln for ln in tui.render_debug(model, height=30))
    lvl0 = model.debug.min_level
    tui.handle_key(model, "L")
    assert model.debug.min_level != lvl0
    tui.handle_key(model, "x")
    assert model.debug.lines(logging.DEBUG) == []


def test_advanced_keys(model):
    tui.handle_key(model, "5")
    g0 = model.advanced.memory_strategy
    tui.handle_key(model, "g")
    assert model.advanced.memory_strategy != g0
    tui.handle_key(model, "A")
    assert model.advanced.adaptive_quality is False
    tui.handle_key(model, "r")
    assert "VRAM:" in "\n".join(tui.render_advanced(model))


def test_benchmark_keys(model):
    tui.handle_key(model, "6")
    tui.handle_key(model, "b")
    assert model.benchmark.wait(timeout=600)
    txt = "\n".join(tui.render_benchmark(model))
    assert model.benchmark.state.error is None, model.benchmark.state.error
    assert "fps" in txt and model.benchmark.rows()


def test_accessibility_keys(model):
    tui.handle_key(model, "7")
    th0 = model.accessibility.theme
    tui.handle_key(model, "T")
    assert model.accessibility.theme != th0
    tui.handle_key(model, "]")
    assert model.accessibility.font_scale > 1.0
    tui.handle_key(model, "M")
    assert model.accessibility.reduced_motion
    tui.handle_key(model, "w")
    cfgs = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.environ["XDG_CONFIG_HOME"])
        for f in fs
    ]
    assert any(f.endswith("ui.json") for f in cfgs)


def test_quit_key(model):
    assert tui.handle_key(model, "q") is False
    assert model.quit_requested


def test_unknown_keys_are_noops(model):
    for k in ("z", "?", "", "\x1b"):
        assert tui.handle_key(model, k)
