"""Concurrency stress — the race-detection story (SURVEY §5: the reference
has no sanitizers; safety is by construction). These tests hammer the shared
structures from multiple threads and assert invariants hold."""

import threading
import time

import numpy as np
import pytest

from nu_scaler_tpu.capture.sources import FrameRing
from nu_scaler_tpu.runtime import framering as fr


def _hammer_ring(ring, n_producers=4, frames_each=200):
    errors = []

    def produce(tid):
        try:
            for i in range(frames_each):
                data = bytes([tid] * 16)
                ring.push((data, 2, 2))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def consume(stop):
        try:
            while not stop.is_set():
                got = ring.latest()
                if got is not None:
                    data, w, h = got
                    assert len(data) == 16 and (w, h) == (2, 2)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    stop = threading.Event()
    threads = [threading.Thread(target=produce, args=(t,)) for t in range(n_producers)]
    consumer = threading.Thread(target=consume, args=(stop,))
    consumer.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    consumer.join()
    assert not errors, errors
    return ring


def test_python_ring_thread_safety():
    ring = _hammer_ring(FrameRing(capacity=4))
    assert ring.frames_pushed == 4 * 200


def test_native_ring_thread_safety():
    if not fr.native_available():
        pytest.skip("no native toolchain")
    ring = _hammer_ring(fr.NativeFrameRing(capacity=4, max_frame_bytes=64))
    assert ring.frames_pushed == 4 * 200


def test_concurrent_upscalers():
    """Independent upscalers on separate threads must not interfere (the
    reference's rayon batch path implies this invariant)."""
    import nu_scaler_core

    results = {}
    errors = []

    def work(tid):
        try:
            up = nu_scaler_core.PyWgpuUpscaler("quality", "bilinear")
            up.initialize(16, 16, 32, 32)
            frame = np.full((16, 16, 4), tid * 10, np.uint8)
            results[tid] = up.upscale(frame.tobytes())
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=work, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for tid, out in results.items():
        arr = np.frombuffer(out, np.uint8)
        assert np.all(arr[::4] == tid * 10)  # R channel preserved per thread
