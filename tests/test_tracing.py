"""Tracing utilities."""

import time

from nu_scaler_tpu.utils.tracing import FrameClock, Timer, device_timer, fetch_overhead_s


def test_frame_clock_ema():
    clock = FrameClock()
    for _ in range(10):
        clock.tick()
        time.sleep(0.005)
    assert clock.frames == 10
    assert clock.ema_fps > 0
    p = clock.percentiles()
    assert p["p50_ms"] >= 0


def test_timer():
    with Timer() as t:
        time.sleep(0.01)
    assert t.ms >= 9


def test_device_timer():
    import jax.numpy as jnp

    spf = device_timer(lambda s: s * 1.0000001, jnp.ones((128, 128)), iters=10,
                       overhead_s=fetch_overhead_s(3))
    assert spf > 0
