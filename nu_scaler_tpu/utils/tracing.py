"""Tracing / profiling utilities — SURVEY §5 "tracing/profiling" parity.

The reference exposes (a) GPU timestamp-query durations
(`get_last_gpu_duration_ms`, wgpu_interpolator.rs:389-438), (b) CPU Instant
timing around hot calls, (c) an FPS EMA for the UI overlay. TPU equivalents:

  * `device_timer` — times a jitted callable's device execution by running
    `iters` chained repetitions in one `lax.fori_loop` and fetching once
    (immune to dispatch/tunnel latency; the technique bench.py uses).
  * `trace_to` — context manager around `jax.profiler` emitting a
    TensorBoard-loadable trace directory.
  * `FrameClock` — FPS EMA with the reference's 0.95/0.05 smoothing
    (main.py:1128-1163) plus p50/p99 windows.
  * `Timer` — lightweight scoped wall timer for host-side stages.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Callable, Optional

import numpy as np


@contextlib.contextmanager
def trace_to(logdir: str):
    """jax.profiler trace context (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fetch_overhead_s(reps: int = 10) -> float:
    """Measured host↔device scalar-fetch round trip (to subtract from wall
    timings; ~29 ms through the axon tunnel, ~µs on local hardware)."""
    import jax
    import jax.numpy as jnp

    t = jax.device_put(np.ones((8, 8), np.float32))
    tiny = jax.jit(lambda a: a.sum())
    float(tiny(t))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(tiny(t))
    return (time.perf_counter() - t0) / reps


def device_timer(
    body: Callable,
    state0,
    iters: int = 50,
    overhead_s: Optional[float] = None,
    repeats: int = 3,
) -> float:
    """Seconds per step of `body` (a shape-preserving state→state function)
    on-device. Chains steps in one fori_loop so the measurement is compute,
    not dispatch — and times the SAME compiled loop at two trip counts
    (`iters` and 4×`iters`), dividing the wall-time difference by the step
    difference. The constant dispatch/fetch/tunnel cost cancels exactly in
    the slope, instead of being estimated and subtracted (a mis-estimated
    overhead on a slow tunnel once turned short runs negative → 1e-9 clamps
    → absurd fps). `overhead_s` is accepted for backward compatibility and
    ignored.

    Sampling is INTERLEAVED (n1, n2, n1, n2, …) and the slope uses the
    per-count medians: an r3 run showed min-of-3 sequential sampling is not
    enough — a transient tunnel stall can inflate EVERY short-count sample
    while the long-count samples (taken later) read clean, and the slope
    then under-reports the step by 4× (a 2678-fps pipeline read 12205).
    Interleaving puts both trip counts in the same tunnel regime; medians
    drop residual single-sample stalls."""
    import jax
    import jax.numpy as jnp

    del overhead_s  # slope method — constant overhead cancels, no estimate needed

    @jax.jit
    def run(state, n):
        # n is traced → ONE compiled program (a while_loop) serves both trip
        # counts, so per-step cost is identical between the two timings.
        return jax.lax.fori_loop(0, n, lambda i, s: body(s), state)

    probe = jax.jit(
        lambda s: sum(
            jnp.sum(x.reshape(-1)[:2].astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(s)
        )
    )
    n1 = max(int(iters), 1)
    n2 = 4 * n1
    float(probe(run(state0, n1)))  # compile + warm

    def once(n: int) -> float:
        t0 = time.perf_counter()
        float(probe(run(state0, n)))
        return time.perf_counter() - t0

    once(n2)  # warm the long path too before timing
    t1s, t2s = [], []
    for _ in range(max(int(repeats), 2)):
        t1s.append(once(n1))
        t2s.append(once(n2))
    slope = (float(np.median(t2s)) - float(np.median(t1s))) / (n2 - n1)
    # the long-count average is a hard upper bound on the true step time
    # (it still CONTAINS the positive dispatch/fetch overhead), so a slope
    # above it means the short-count samples hit a stall window — fall back
    # to the bound-respecting estimate rather than report an inflated step
    upper = min(t2s) / n2
    return min(max(slope, 1e-9), upper)


class FrameClock:
    """FPS EMA (0.95/0.05) + windowed percentiles for overlay stats."""

    def __init__(self, window: int = 240):
        self.ema_fps = 0.0
        self.frames = 0
        self._last: Optional[float] = None
        self._durations = deque(maxlen=window)

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._durations.append(dt)
            inst = 1.0 / dt if dt > 0 else 0.0
            self.ema_fps = 0.95 * self.ema_fps + 0.05 * inst if self.frames > 1 else inst
        self._last = now
        self.frames += 1
        return self.ema_fps

    def percentiles(self) -> dict:
        if not self._durations:
            return {"p50_ms": 0.0, "p99_ms": 0.0}
        d = np.asarray(self._durations) * 1000.0
        return {
            "p50_ms": float(np.percentile(d, 50)),
            "p99_ms": float(np.percentile(d, 99)),
        }


class Timer:
    """Scoped wall timer: `with Timer() as t: ...; t.ms`."""

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        self.ms = self.seconds * 1000.0
        return False
