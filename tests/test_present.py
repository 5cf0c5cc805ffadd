"""Presentation layer — triple buffer, adaptive skipping, single-instance
lock, presenter loop (fullscreen.rs:59-193,696-948 + wgpu_renderer.rs:89-123
behaviors)."""

import os
import threading
import time

import pytest

from nu_scaler.present import (
    AdaptiveFrameStats,
    FullscreenPresenter,
    SingleInstanceLock,
    TripleBuffer,
)


def test_triple_buffer_latest_wins():
    tb = TripleBuffer()
    assert tb.read_latest() is None
    for i in range(7):
        tb.write((bytes([i]), 1, 1))
    assert tb.read_latest()[0] == bytes([6])
    # writer keeps moving while a reader holds the latest
    held = tb.read_latest()
    tb.write((b"\x63", 1, 1))
    assert held[0] == bytes([6])
    assert tb.read_latest()[0] == b"\x63"


def test_triple_buffer_concurrent_stress():
    tb = TripleBuffer()
    stop = threading.Event()
    errors = []

    def writer():
        i = 0
        while not stop.is_set():
            tb.write((i.to_bytes(4, "little"), 1, 1))
            i += 1

    def reader():
        last = -1
        while not stop.is_set():
            fr = tb.read_latest()
            if fr is not None:
                v = int.from_bytes(fr[0], "little")
                if v < last - 2:  # ring of 3: can never go far backwards
                    errors.append((last, v))
                last = max(last, v)

    ts = [threading.Thread(target=writer), threading.Thread(target=reader)]
    for t in ts:
        t.start()
    time.sleep(0.3)
    stop.set()
    for t in ts:
        t.join()
    assert not errors


def test_adaptive_stats_variance_smoothing():
    s = AdaptiveFrameStats(target_fps=60.0)
    t = 0.0
    for _ in range(30):  # steady 100 fps
        s.on_presented(now=t)
        t += 0.01
    assert 90.0 < s.fps <= 101.0
    assert len(s.fps_history) == 29
    # stable stream → fast smoothing (0.8): one slow frame moves fps a lot
    before = s.fps
    s.on_presented(now=t + 0.1)
    assert s.fps < before - 5.0


def test_adaptive_skip_policy():
    s = AdaptiveFrameStats(target_fps=60.0, enable_frame_skipping=True)
    s.fps = 30.0  # struggling → adaptive skipping active
    assert s.should_skip(elapsed_in_tick_s=0.010)  # >budget/4 (4.2 ms)
    assert not s.should_skip(elapsed_in_tick_s=0.001)
    s.fps = 60.0  # healthy → no skipping
    assert not s.should_skip(elapsed_in_tick_s=0.010)
    s2 = AdaptiveFrameStats(target_fps=60.0, enable_frame_skipping=False)
    s2.fps = 20.0
    assert not s2.should_skip(0.010)
    assert s.frames_skipped == 1


def test_single_instance_lock(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_RUNTIME_DIR", str(tmp_path))
    a = SingleInstanceLock("t")
    b = SingleInstanceLock("t")
    assert a.acquire()
    # same-pid reacquire treats the lock as our own (pid == getpid)
    assert b.acquire()
    b.release()
    # stale lock (dead pid) is taken over
    with open(a.path, "w") as f:
        f.write("999999999")
    c = SingleInstanceLock("t")
    assert c.acquire()
    c.release()
    # live foreign pid blocks
    with open(c.path, "w") as f:
        f.write("1")  # init: alive, not ours
    d = SingleInstanceLock("t")
    assert not d.acquire()
    os.unlink(c.path)
    with SingleInstanceLock("t") as e:
        assert e.held


def test_presenter_end_to_end():
    frames = []
    p = FullscreenPresenter(blit=lambda d, w, h: frames.append((d, w, h)), target_fps=240.0)
    p.start()
    try:
        for i in range(5):
            p.submit(bytes([i] * 16), 2, 2)
            time.sleep(0.02)
    finally:
        p.stop()
    assert frames, "presenter never blitted"
    assert frames[-1][0][0] in range(5)
    assert p.stats.frames_presented == len(frames)
    # dedupe: same write never presented twice
    assert p.stats.frames_presented <= p.buffer.writes
    assert any("present FPS" in ln for ln in p.overlay_lines())


def test_presenter_single_instance_conflict(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_RUNTIME_DIR", str(tmp_path))
    # a LIVE foreign process (pid 1) holds the lock → start() must refuse
    lock = SingleInstanceLock()
    with open(lock.path, "w") as f:
        f.write("1")
    p = FullscreenPresenter(blit=lambda *a: None, single_instance=True)
    with pytest.raises(RuntimeError, match="another NU Scaler"):
        p.start()
    os.unlink(lock.path)
    p2 = FullscreenPresenter(blit=lambda *a: None, single_instance=True).start()
    p2.stop()
