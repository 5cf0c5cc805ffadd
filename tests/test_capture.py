"""Capture subsystem: ring semantics, producer thread, targets, facade."""

import time

import numpy as np

import nu_scaler_core as nsc
from nu_scaler_tpu.capture import (
    CaptureTarget,
    FrameRing,
    ScreenCapture,
    SyntheticSource,
)


def test_frame_ring_latest_drain():
    ring = FrameRing(capacity=3)
    assert ring.latest() is None
    for i in range(5):
        ring.push((bytes([i]), 1, 1))
    assert ring.frames_dropped == 2  # capacity 3, pushed 5
    frame = ring.latest()
    assert frame == (bytes([4]), 1, 1)
    assert ring.latest() is None  # drained


def test_synthetic_source_moves():
    src = SyntheticSource(64, 48)
    f0 = src.next_frame()
    f1 = src.next_frame()
    assert f0.shape == (48, 64, 4)
    assert f0.dtype == np.uint8
    assert np.all(f0[..., 3] == 255)
    for _ in range(8):
        f1 = src.next_frame()
    assert not np.array_equal(f0, f1)  # the square moved


def _wait_frame(cap, timeout=5.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        f = cap.get_frame()
        if f is not None:
            return f
        time.sleep(0.01)
    raise AssertionError("no frame within timeout")


def test_screen_capture_lifecycle():
    cap = ScreenCapture(fps=120)
    assert cap.get_frame() is None  # not started
    cap.start(CaptureTarget.fullscreen())
    data, w, h = _wait_frame(cap)
    assert len(data) == w * h * 4
    cap.stop()
    assert cap.get_frame() is None


def test_region_capture():
    cap = ScreenCapture(fps=120)
    cap.start(CaptureTarget.region(10, 20, 100, 50))
    data, w, h = _wait_frame(cap)
    assert (w, h) == (100, 50)
    cap.stop()


def test_py_screen_capture_facade():
    cap = nsc.PyScreenCapture()
    windows = nsc.PyScreenCapture.list_windows()
    assert isinstance(windows, list) and windows
    cap.start(nsc.PyCaptureTarget.FullScreen)
    frame = None
    for _ in range(500):
        frame = cap.get_frame()
        if frame is not None:
            break
        time.sleep(0.01)
    assert frame is not None
    data, w, h = frame
    assert isinstance(data, bytes) and len(data) == w * h * 4
    cap.stop()


def test_py_capture_window_target():
    cap = nsc.PyScreenCapture()
    cap.start(nsc.PyCaptureTarget.WindowByTitle, nsc.PyWindowByTitle("Test Window"))
    frame = None
    for _ in range(500):
        frame = cap.get_frame()
        if frame is not None:
            break
        time.sleep(0.01)
    assert frame is not None
    cap.stop()


def test_capture_and_upscale_roundtrip(pattern):
    """The NuScaler::capture_and_upscale composite (lib.rs:934-987)."""
    cap = nsc.PyScreenCapture()
    cap.start(nsc.PyCaptureTarget.FullScreen)
    data, w, h = None, 0, 0
    for _ in range(500):
        f = cap.get_frame()
        if f is not None:
            data, w, h = f
            break
        time.sleep(0.01)
    cap.stop()
    assert data is not None
    up = nsc.PyWgpuUpscaler("performance", "nearest")
    up.initialize(w, h, w * 2, h * 2)
    out = up.upscale(data)
    assert len(out) == w * 2 * h * 2 * 4
