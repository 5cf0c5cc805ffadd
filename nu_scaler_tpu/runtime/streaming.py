"""Double-buffered host↔device streaming — the TPU replacement for the
reference's buffer-pool + blocking staging-buffer readback
(upscale/mod.rs:973-1055, SURVEY §3.1) and its QTimer live loop (§3.3).

Key idea: JAX dispatch is asynchronous. `device_put` of frame N+1 and the
jitted pipeline call on frame N overlap automatically as long as the host
never blocks between them; the only synchronization point is fetching frame
N-1's output. `FramePipeline.process` rotates those three stages, so H2D,
compute and D2H all overlap — the reference's round-robin triple buffer pool
(3 in-flight slots) expressed the XLA way.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np


class FramePipeline:
    """Software-pipelined frame processor.

    fn: compiled device function (u8 array in → u8 array out, device-resident)
    depth: number of frames in flight (2 = double buffering, 3 = triple;
           maps from AllocationStrategy.buffers_in_flight)
    """

    def __init__(self, fn: Callable, device=None, depth: int = 2) -> None:
        self.fn = fn
        self.device = device or jax.devices()[0]
        self.depth = max(1, depth)
        self._inflight: list[jax.Array] = []

    def put(self, frame: np.ndarray) -> Optional[jax.Array]:
        """Feed one frame; returns a *completed* output once the pipeline is
        full, else None (still filling)."""
        dev_frame = jax.device_put(frame, self.device)
        out = self.fn(dev_frame)  # dispatched, not blocked
        self._inflight.append(out)
        if len(self._inflight) > self.depth:
            done = self._inflight.pop(0)
            return done
        return None

    def drain(self) -> Iterator[jax.Array]:
        while self._inflight:
            yield self._inflight.pop(0)

    def process_stream(self, frames: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        for f in frames:
            out = self.put(f)
            if out is not None:
                yield np.asarray(out)
        for out in self.drain():
            yield np.asarray(out)


class LivePipeline:
    """The live tick (§3.3) fused for TPU: capture → [interpolate prev/cur] →
    upscale, with double-buffered transfers.

    Per input frame the pipeline emits `2` output frames when interpolation is
    on (the mid frame and the current frame — 30→60 fps frame generation), or
    1 otherwise.
    """

    def __init__(
        self,
        upscale_fn: Callable,
        interp_fn: Optional[Callable] = None,
        device=None,
        depth: int = 2,
        amortize_blend: bool = False,
        fused_step_fn: Optional[Callable] = None,
        ingest_fn: Optional[Callable] = None,
        deliver_fn: Optional[Callable] = None,
    ) -> None:
        self.upscale_fn = upscale_fn
        self.interp_fn = interp_fn
        self.device = device or jax.devices()[0]
        self.depth = max(1, depth)
        # transfer-minimal live formats (ops/color.py): `ingest_fn` converts
        # planar 4:2:0 capture frames (a (y, u, v) tuple fed to put) to RGBA
        # on-device (1.5 B/px over the link instead of 4); `deliver_fn` maps
        # each output frame to its host-transfer payload on-device (4:2:0
        # planes and/or a preview resolution). The reference swizzled full
        # BGRA on the CPU both ways (realtime.rs:463-494).
        self.ingest_fn = ingest_fn
        self.deliver_fn = deliver_fn
        # cross-fade commutes with linear resampling: blend ALREADY-UPSCALED
        # frames and reuse the previous step's upscale — one upscale + one
        # cheap blend per 2 output frames (valid for blend-mode interp only)
        self.amortize_blend = amortize_blend
        # fastest path: `kernels/resample_pallas.make_pallas_fused_blend` —
        # ONE kernel emits the fresh 4K upscale AND the cross-fade mid
        # (1.54 → 1.03 ms/step at 1080p→4K on v5e). Contract:
        # fn(cur_u8, prev_up_2d) → (cur_up_2d, mid_2d) padded-2D u8, with
        # fn.out2d the padded shape; mids match blend_only within ±1 on
        # f32 rounding ties.
        self.fused_step_fn = fused_step_fn
        self._prev: Optional[jax.Array] = None
        self._prev_up: Optional[jax.Array] = None
        self._inflight: list[tuple] = []
        self.frames_in = 0
        self.frames_out = 0

    @staticmethod
    def _fetch(payload):
        if isinstance(payload, tuple):
            return tuple(np.asarray(p) for p in payload)
        return np.asarray(payload)

    def put(self, frame) -> list:
        """Feed one captured frame; returns 0+ completed host-side output
        payloads (RGBA arrays, or plane tuples under a 4:2:0 deliver_fn)."""
        return [self._fetch(o) for o in self.put_device(frame)]

    def put_device(self, frame) -> list:
        """Like put(), but returns DEVICE payloads without host sync — the
        presenter decides per frame whether to pay the D2H fetch (adaptive
        frame skipping then saves the transfer, the live bottleneck, the way
        fullscreen.rs's skip saved the render)."""
        if self.ingest_fn is not None and isinstance(frame, tuple):
            planes = tuple(jax.device_put(p, self.device) for p in frame)
            cur = self.ingest_fn(*planes)
        else:
            cur = jax.device_put(frame, self.device)
        outs: list = []
        if self.fused_step_fn is not None:
            import jax.numpy as jnp

            fb = self.fused_step_fn
            if self._prev_up is None:
                # pipeline fill: first frame's upscale (mid vs zeros dropped)
                self._prev_up = fb(cur, jnp.zeros(fb.out2d, jnp.uint8))[0]
                oh, ow = fb.out_hw
                outs.append(self._prev_up[:oh, : ow * 4].reshape(oh, ow, 4))
            else:
                cur_up2d, mid2d = fb(cur, self._prev_up)
                oh, ow = fb.out_hw
                outs.append(mid2d[:oh, : ow * 4].reshape(oh, ow, 4))
                outs.append(cur_up2d[:oh, : ow * 4].reshape(oh, ow, 4))
                self._prev_up = cur_up2d
        elif self.amortize_blend and self.interp_fn is not None:
            cur_up = self.upscale_fn(cur)
            if self._prev_up is not None:
                outs.append(self.interp_fn(self._prev_up, cur_up, 0.5))
            outs.append(cur_up)
            self._prev_up = cur_up
        else:
            if self.interp_fn is not None and self._prev is not None:
                mid = self.interp_fn(self._prev, cur, 0.5)
                outs.append(self.upscale_fn(mid))
            outs.append(self.upscale_fn(cur))
        self._prev = cur
        self.frames_in += 1
        if self.deliver_fn is not None:
            outs = [self.deliver_fn(o) for o in outs]
        self._inflight.append(tuple(outs))
        ready: list = []
        if len(self._inflight) > self.depth:
            for o in self._inflight.pop(0):
                ready.append(o)
                self.frames_out += 1
        return ready

    def drain(self) -> list:
        return [self._fetch(o) for o in self.drain_device()]

    def drain_device(self) -> list:
        ready = []
        while self._inflight:
            for o in self._inflight.pop(0):
                ready.append(o)
                self.frames_out += 1
        return ready


def benchmark_live_pipeline(
    upscale_fn: Callable,
    interp_fn: Optional[Callable],
    frames: list[np.ndarray],
    warmup: int = 4,
    depth: int = 2,
) -> dict:
    """Throughput/latency of the fused live pipeline over a frame sequence.

    Returns output-frames/sec and per-input-step latency percentiles.
    """
    pipe = LivePipeline(upscale_fn, interp_fn, depth=depth)
    # warm-up (compile + pipeline fill)
    for f in frames[:warmup]:
        pipe.put(f)
    pipe.drain()

    pipe.frames_out = 0
    step_times = []
    t0 = time.perf_counter()
    for f in frames[warmup:]:
        s0 = time.perf_counter()
        pipe.put(f)
        step_times.append((time.perf_counter() - s0) * 1000.0)
    pipe.drain()
    total = time.perf_counter() - t0
    n_out = pipe.frames_out
    return {
        "output_frames": n_out,
        "seconds": total,
        "fps": n_out / total if total > 0 else float("inf"),
        "p50_step_ms": float(np.percentile(step_times, 50)) if step_times else 0.0,
        "p99_step_ms": float(np.percentile(step_times, 99)) if step_times else 0.0,
    }
