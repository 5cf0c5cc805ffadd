#!/usr/bin/env python
"""Headline benchmark — BASELINE.json north star:

    1080p→4K Lanczos3 upscale + 2x frame interpolation, streaming,
    target ≥ 240 output frames/sec/chip on TPU v5e.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...extras}

Methodology: the dev TPU is reached through a tunnel whose host↔device
round trip is ~29 ms, and whose `block_until_ready` does not reliably fence
queued work — so per-call wall timing measures the tunnel, not the chip. Each
config therefore runs chained pipeline steps inside ONE jitted
`lax.fori_loop` (the next step consumes a crop of the previous output, a real
data dependency), with a single scalar fetch at the end — timed at TWO trip
counts (N and 4N) so the constant dispatch/fetch overhead cancels in the
slope rather than being estimated. Details go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
)

import jax
import jax.numpy as jnp
import numpy as np

from nu_scaler_tpu.bench.harness import generate_test_pattern
from nu_scaler_tpu.ops import fsr as fsr_ops
from nu_scaler_tpu.ops import interpolate as interp_ops
from nu_scaler_tpu.ops import resample

TARGET_FPS = 240.0
IN_H, IN_W = 1080, 1920
OUT_H, OUT_W = 2160, 3840


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def fetch_overhead_s(reps: int = 10) -> float:
    t = jax.device_put(np.ones((8, 8), np.float32))
    tiny = jax.jit(lambda a: a.sum())
    float(tiny(t))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(tiny(t))
    return (time.perf_counter() - t0) / reps


def timed_loop(body, state0, iters: int, overhead_s: float, repeats: int = 3) -> float:
    """Run chained steps of `body` in one jitted fori_loop; return seconds per
    step (device time). Slope method via tracing.device_timer: the same
    compiled loop is timed at `iters` and 4×`iters` trip counts and the
    difference divided — the tunnel dispatch/fetch constant cancels exactly
    (estimating and subtracting it broke an r3 run when the tunnel was slow:
    short runs went negative → 1e-9 clamp → 2e10 fps)."""
    del overhead_s
    from nu_scaler_tpu.utils.tracing import device_timer

    return device_timer(body, state0, iters=iters, repeats=repeats)


def make_input(seed: int = 0) -> np.ndarray:
    f = generate_test_pattern(IN_W, IN_H)
    f[480:600, 640:760, :3] = 255
    return f


def chain_next(cur, *outs):
    """Next-step input for the chained timing loops: the resident 1080p
    frame perturbed by a scalar reduced from EVERY output tensor — a real
    data dependency that forces the full outputs (XLA cannot slice-through
    or elide any of them) without billing a relayout to the step.

    The r1-r3 harness chained ``out[:1080, :1920, :]`` instead, which (a)
    cost a u8 relayout per step — +0.09 ms on the plain resampler and
    +0.62 ms on the flow_soft step, whose non-32-row-granule crop feeds
    the Pallas warp's tiled input — and (b) kept each step's OTHER outputs
    live only through tiny slice checksums, which XLA can (and did)
    compute without materializing the full tensors. Full-sum chaining
    matches the crop on conv-dominated graphs (tpu4-int8 3.829 vs
    3.846 ms — nothing elidable there) and isolates the honest step cost
    everywhere else (tools/experiments/surgery8_chain_tax.py, r4)."""
    v = None
    for o in outs:
        s = jnp.sum(o.astype(jnp.int32))
        v = s if v is None else v + s
    v = (v % 2).astype(jnp.float32)
    return jnp.clip(cur.astype(jnp.float32) + v, 0.0, 255.0).astype(jnp.uint8)


def blend_amortized_body():
    """Amortized blend pipeline: cross-fade commutes with linear resampling,
    so the mid frame is blended from ALREADY-UPSCALED 4K frames and the
    previous step's upscale is reused — ONE 1080p→4K upscale + one 4K blend
    per step (2 output frames), instead of two upscales."""
    up = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")

    def body(state):
        prev_up, cur, acc = state
        cur_up = up(cur)
        mid = interp_ops.blend_only(prev_up, cur_up, 0.5)
        nxt = chain_next(cur, cur_up, mid)  # forces the FULL mid (r1-r3
        # kept only an 8-px checksum live — XLA elided most of the blend)
        return (cur_up, nxt, acc)

    return body


def blend_fused_body(ts=(0.5,)):
    """Amortized blend with the blend fused INTO the resampler kernel
    (kernels/resample_pallas.make_pallas_fused_blend): one pallas_call per
    step emits the fresh 4K upscale AND one cross-fade mid per t, so the
    fresh upscale is never re-read from HBM for the blends. State carries
    the padded-2D 4K product between steps. ts=(1/3, 2/3) is 3× frame
    generation: three 4K output frames from one kernel pass per step."""
    from nu_scaler_tpu.kernels.resample_pallas import make_pallas_fused_blend

    fb = make_pallas_fused_blend(IN_H, IN_W, OUT_H, OUT_W, "lanczos3", tuple(ts))

    def body(state):
        prev_up2d, cur, acc = state
        outs = fb(cur, prev_up2d)
        cur_up2d, mids = outs[0], outs[1:]
        # cur_up2d feeds the next kernel call (real pipeline data flow);
        # the mids are materialized by the pallas_call itself — the chain
        # scalar just keeps them rooted
        nxt = chain_next(cur, *mids)
        return (cur_up2d, nxt, acc)

    return fb, body


def pipeline_body(mode: str):
    """(prev, cur) → (cur, next): one live step = interp at 1080p + batched
    pair upscale to 4K; `next` is derived from the 4K output (dependency)."""
    up = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")

    if mode == "blend":
        mid_fn = interp_ops.blend_only
    elif mode == "flow_soft":
        # production fused path: half-res flow → tile means → Pallas warp
        mid_fn = interp_ops.soft_interp_fast
    elif mode == "flow_soft_ref":
        # quality MC tier: soft warp + the learned refinement net + the 4K
        # resample in ONE program, with the net's output staying in the
        # PHASE domain into the resampler's banded passes (the d2s relayout
        # never happens — interp_ops.make_refined_mid_upscaler)
        from nu_scaler_tpu.models.interp_refine import refine_available

        if not refine_available():
            raise RuntimeError("no interp_ref4 checkpoint")
        mid_up = interp_ops.make_refined_mid_upscaler(IN_H, IN_W, OUT_H, OUT_W)

        def body(state):
            prev, cur, acc = state
            out_mid = mid_up(prev, cur, 0.5)
            out_cur = up(cur)
            nxt = chain_next(cur, out_mid, out_cur)
            return (cur, nxt, acc)

        return body
    else:
        base_level = 1 if mode == "flow_half" else 0

        def mid_fn(a, b, t):
            flow = interp_ops.compute_flow_fast(a, b, base_level=base_level)
            return interp_ops.warp_blend_fast(a, b, flow, t)

    def body(state):
        prev, cur, acc = state
        mid = mid_fn(prev, cur, 0.5)
        out_mid = up(mid)  # single-frame calls ride the fused Pallas kernel
        out_cur = up(cur)
        nxt = chain_next(cur, out_mid, out_cur)
        return (cur, nxt, acc)

    return body


def soft3x_body():
    """3× frame generation (the FSR3 frame-gen role): ONE motion solve per
    pair (soft_interp_multi), two motion-compensated mids at t=1/3, 2/3,
    three 4K outputs per step (mid1, mid2, cur)."""
    up = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")

    def body(state):
        prev, cur, acc = state
        mids = interp_ops.soft_interp_multi(prev, cur, (1.0 / 3.0, 2.0 / 3.0))
        out_m1 = up(mids[0])
        out_m2 = up(mids[1])
        out_cur = up(cur)
        nxt = chain_next(cur, out_m1, out_m2, out_cur)
        return (cur, nxt, acc)

    return body


def soft3x_ref_body():
    """3× frame generation with learned refinement: one motion solve per
    pair, both mids refined by the phase-domain net and resampled through
    the phase path (interp_ops.make_refined_multi_upscaler — held-out
    +0.70 dB / +0.065 SSIM over flow_soft at t=1/3, 2/3)."""
    up = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")
    multi_up = interp_ops.make_refined_multi_upscaler(
        IN_H, IN_W, OUT_H, OUT_W, (1.0 / 3.0, 2.0 / 3.0)
    )

    def body(state):
        prev, cur, acc = state
        outs = multi_up(prev, cur)
        out_cur = up(cur)
        nxt = chain_next(cur, outs, out_cur)
        return (cur, nxt, acc)

    return body


def perf_interp_body():
    """The "performance" interpolation tier: motion compensation runs at
    540p (flow + warp), the mid frame upscales 540p→4K directly while the
    current frame takes the regular 1080p→4K path. Quality sits between
    cross-fade and full-res MC at a fraction of the cost."""
    half = resample.make_resampler(IN_H, IN_W, IN_H // 2, IN_W // 2, "area")
    up_full = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")
    up_mid = resample.make_resampler(IN_H // 2, IN_W // 2, OUT_H, OUT_W, "lanczos3")

    def body(state):
        prev, cur, acc = state
        ph, ch = half(prev), half(cur)
        flow = interp_ops.compute_flow_fast(ph, ch, levels=3)
        mid_half = interp_ops.warp_blend_fast(ph, ch, flow, 0.5)
        out_mid = up_mid(mid_half)
        out_cur = up_full(cur)
        nxt = chain_next(cur, out_mid, out_cur)
        return (cur, nxt, acc)

    return body


def bench_pipeline(mode: str, iters: int, overhead_s: float) -> dict:
    if mode in ("blend", "flow", "flow_half", "flow_soft", "flow_soft_ref"):
        frame = make_input()
        prev = jax.device_put(frame)
        cur = jax.device_put(np.roll(frame, 16, axis=1))
        acc0 = jnp.zeros((), jnp.float32)
        spf = timed_loop(pipeline_body(mode), (prev, cur, acc0), iters, overhead_s)
        return {"fps": 2.0 / spf, "step_ms": spf * 1000.0}
    if mode == "soft3x":
        frame = make_input()
        prev = jax.device_put(frame)
        cur = jax.device_put(np.roll(frame, 16, axis=1))
        acc0 = jnp.zeros((), jnp.float32)
        spf = timed_loop(soft3x_body(), (prev, cur, acc0), iters, overhead_s)
        return {"fps": 3.0 / spf, "step_ms": spf * 1000.0}
    if mode == "soft3x_ref":
        frame = make_input()
        prev = jax.device_put(frame)
        cur = jax.device_put(np.roll(frame, 16, axis=1))
        acc0 = jnp.zeros((), jnp.float32)
        spf = timed_loop(soft3x_ref_body(), (prev, cur, acc0), iters, overhead_s)
        return {"fps": 3.0 / spf, "step_ms": spf * 1000.0}
    if mode == "perf_interp":
        frame = make_input()
        prev = jax.device_put(frame)
        cur = jax.device_put(np.roll(frame, 16, axis=1))
        acc0 = jnp.zeros((), jnp.float32)
        spf = timed_loop(perf_interp_body(), (prev, cur, acc0), iters, overhead_s)
        return {"fps": 2.0 / spf, "step_ms": spf * 1000.0}
    if mode == "blend_amortized":
        frame = make_input()
        up = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")
        prev_up = up(jax.device_put(frame))
        cur = jax.device_put(np.roll(frame, 16, axis=1))
        acc0 = jnp.zeros((), jnp.float32)
        spf = timed_loop(blend_amortized_body(), (prev_up, cur, acc0), iters, overhead_s)
        return {"fps": 2.0 / spf, "step_ms": spf * 1000.0}
    if mode in ("blend_fused", "blend_fused_3x"):
        ts = (1.0 / 3.0, 2.0 / 3.0) if mode == "blend_fused_3x" else (0.5,)
        frame = make_input()
        fb, body = blend_fused_body(ts)
        prev = jax.device_put(frame)
        prev_up2d = fb(prev, jnp.zeros(fb.out2d, jnp.uint8))[0]
        cur = jax.device_put(np.roll(frame, 16, axis=1))
        acc0 = jnp.zeros((), jnp.float32)
        spf = timed_loop(body, (prev_up2d, cur, acc0), iters, overhead_s)
        return {"fps": (1.0 + len(ts)) / spf, "step_ms": spf * 1000.0}
    raise ValueError(f"unknown bench mode {mode!r}")


def bench_live(n_frames: int = 10, warmup: int = 3, fmt: str | None = None,
               preview_h: int | None = None, adaptive: bool = True) -> dict:
    """BASELINE config #4 — the consolidated LIVE pipeline number: planar
    4:2:0 capture frames (the Y4M capture path's native format, 1.5 B/px)
    → on-device RGBA → fused blend-interp + lanczos3 4K upscale
    (LivePipeline) → on-device delivery conversion (`fmt`, optionally at
    `preview_h`) → presenter.

    The D2H fetch IS the present: `put_device` returns device payloads and
    `AdaptiveFrameStats.should_skip` decides per frame whether to pay the
    transfer — the live bottleneck on this 49 MB/s dev tunnel — the way
    fullscreen.rs's frame skipping saved the render. `target_fps` is derived
    from the measured link (the warmup fetch-everything step wall): the
    quarter-budget threshold lands mid-step, so both branches run in the
    measured loop (VERDICT r3 #8). The reference shipped full BGRA each way
    and swizzled on the CPU (realtime.rs:463-494) while its GUI only ever
    presented a preview-sized pixmap (main.py:1117-1173).

    fmt/preview_h come from NU_LIVE_DELIVERY / NU_LIVE_PREVIEW_H when unset;
    `adaptive=False` fetches every frame (the pre-r4 full-delivery loop —
    kept as the `live_full_rgba_fps` comparison line).
    """
    from nu_scaler.present import AdaptiveFrameStats, TripleBuffer
    from nu_scaler_tpu.capture.sources import SyntheticSource
    from nu_scaler_tpu.capture.video import _rgba_to_yuv420
    from nu_scaler_tpu.ops import color
    from nu_scaler_tpu.runtime.streaming import LivePipeline

    if fmt is None:
        fmt = os.environ.get("NU_LIVE_DELIVERY", "yuv420")
    if preview_h is None:
        preview_h = int(os.environ.get("NU_LIVE_PREVIEW_H", "0"))

    src = SyntheticSource(IN_W, IN_H)
    # capture-side 4:2:0 planes, precomputed like frames from a Y4M source
    frames = [_rgba_to_yuv420(src.next_frame()) for _ in range(warmup + n_frames)]
    up = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")
    interp = interp_ops.make_interpolator(OUT_H, OUT_W, "blend")
    try:
        from nu_scaler_tpu.kernels.resample_pallas import make_pallas_fused_blend

        fb = make_pallas_fused_blend(IN_H, IN_W, OUT_H, OUT_W, "lanczos3", 0.5)
    except Exception:  # noqa: BLE001
        fb = None
    deliver = color.make_delivery_fn(OUT_H, OUT_W, fmt, preview_h)
    pipe = LivePipeline(
        up, lambda a, b, t: interp(a, b, t), depth=2, amortize_blend=True,
        fused_step_fn=fb,
        ingest_fn=color.make_yuv420_to_rgba(IN_H, IN_W),
        deliver_fn=deliver,
    )
    buf = TripleBuffer()

    # warmup: compile + pipeline fill + measure the fetch-everything step
    # wall to derive the presenter budget from the real link
    warm_steps: list[float] = []
    for i in range(warmup):
        s0 = time.perf_counter()
        for out in pipe.put_device(frames[i]):
            buf.write(pipe._fetch(out))
        warm_steps.append(time.perf_counter() - s0)
    step_wall = float(np.median(warm_steps[1:] or warm_steps)) or 1.0
    # budget = one fetch-everything step: should_skip's quarter-budget
    # threshold then sits between output 1's elapsed (~0, async dispatch)
    # and output 2's (~one D2H fetch ≈ step_wall/2) — the first output of a
    # step presents, the second skips once the link is saturated, so BOTH
    # branches run in the measured loop and the generator runs ahead of the
    # link instead of stalling on every fetch (VERDICT r3 #8)
    target_fps = 1.0 / step_wall
    stats = AdaptiveFrameStats(target_fps=target_fps, enable_frame_skipping=adaptive)

    skips = presented = 0
    steps: list[float] = []
    pipe.frames_out = 0
    t0 = time.perf_counter()
    for i in range(warmup, warmup + n_frames):
        s0 = time.perf_counter()
        outs = pipe.put_device(frames[i])  # capture → interp → upscale → deliver
        for out in outs:  # present: the skip decision gates the D2H fetch
            tick = time.perf_counter()
            if adaptive and stats.should_skip(tick - s0):
                skips += 1
                continue
            buf.write(pipe._fetch(out))
            latest = buf.read_latest()
            assert latest is not None
            presented += 1
            stats.on_presented(upscale_time_ms=(time.perf_counter() - s0) * 1e3, now=tick)
        steps.append((time.perf_counter() - s0) * 1000.0)
    total = time.perf_counter() - t0
    for out in pipe.drain():
        buf.write(out)
    dh, dw = deliver.out_hw if deliver is not None else (OUT_H, OUT_W)
    return {
        "fps": pipe.frames_out / total if total > 0 else 0.0,
        "presented_fps": presented / total if total > 0 else 0.0,
        "p50_step_ms": float(np.percentile(steps, 50)) if steps else 0.0,
        "p99_step_ms": float(np.percentile(steps, 99)) if steps else 0.0,
        "skipped": skips,
        "presented": presented,
        "output_frames": pipe.frames_out,
        "delivery": f"{fmt}@{dh}x{dw}",
        "payload_mb_in": round(color.payload_bytes("yuv420", IN_H, IN_W) / 1e6, 2),
        "payload_mb_out": round(color.payload_bytes(fmt, dh, dw) / 1e6, 2),
        "target_fps": round(target_fps, 2),
    }


def run_fidelity_gates(extras: dict, failures: list) -> None:
    """On-chip per-path fidelity gates (VERDICT r3 #1).

    Every production output path runs ON THIS DEVICE against its numpy
    golden (`nu_scaler_tpu/kernels/reference.py`, cited into
    /root/reference) or, where a full-res numpy golden is intractable
    (the overlapped-tile warp's pixel-loop golden) or the contract is
    twin-equality (the fused phase-domain refinement), against its
    straightforward on-chip twin. Each gate records `psnr_<path>_db`; a
    value under its threshold OR a crash inside a gate appends to
    `failures`, which makes main() exit non-zero after the JSON line.
    Thresholds follow the 50 dB kernel contract (BASELINE.json;
    `Nu_scale/src/upscale/common.rs:482-531`); the fused-blend mid and
    the refined twin carry only f32 rounding-tie noise (measured ≥54 dB).
    """
    from nu_scaler_tpu.kernels import reference as ref
    from nu_scaler_tpu.ops import interpolate as interp
    from nu_scaler_tpu.ops.metrics import psnr

    frame = make_input()
    cur = np.roll(frame, 16, axis=1)
    dev_a = jax.device_put(frame)
    dev_b = jax.device_put(cur)

    def gate(key: str, thresh: float, fn) -> None:
        try:
            val = float(fn())
        except Exception as e:  # noqa: BLE001 — a crashing path is a failure
            failures.append(f"{key}: crashed ({str(e)[:160]})")
            log(f"fidelity[{key}] CRASHED: {str(e)[:200]}")
            return
        extras[key] = round(val, 1)
        ok = val >= thresh
        log(
            f"fidelity[{key:<21}] {val:6.1f} dB  (gate >= {thresh:g}) "
            f"{'ok' if ok else 'FAIL'}"
        )
        if not ok:
            failures.append(f"{key}: {val:.1f} dB < {thresh:g} dB gate")

    # 1) resamplers vs their separable numpy goldens (WGSL weight semantics)
    for algo in ("bilinear", "bicubic", "lanczos3"):

        def _g_resample(algo=algo):
            out = np.asarray(
                resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, algo)(dev_a)
            )
            return psnr(out, ref.separable_resample_ref(frame, OUT_H, OUT_W, algo))

        gate(f"psnr_{algo}_db", 50.0, _g_resample)

    # 2) FSR EASU+RCAS vs the fsr.rs golden pair. The production chain keeps
    #    f32 between EASU and RCAS where the reference round-trips through an
    #    rgba8 texture (the golden quantizes between passes — with the
    #    quantization inserted, production matches the golden at 90 dB).
    #    Without it, RCAS re-sharpens EASU's rounding ties: ±2 LSB on the CPU
    #    mesh, up to 8 LSB on the real chip (split_bf16 EASU taps flip more
    #    ties; measured r4, BENCH log). Contract: PSNR >= 40 AND
    #    max|diff| <= 12 — a real kernel regression (wrong taps/weights/
    #    clamps) produces tens-of-LSB errors and blows both instantly.
    def _g_fsr():
        out = np.asarray(
            fsr_ops.make_fsr_upscaler(IN_H, IN_W, OUT_H, OUT_W, "quality")(dev_a)
        )
        s = ref.FSR_SHARPNESS["quality"]
        golden = ref.rcas_ref(ref.easu_ref(frame, OUT_H, OUT_W, s), s)
        max_d = int(
            np.abs(out.astype(np.int64) - golden.astype(np.int64)).max()
        )
        log(f"fidelity[fsr] max|diff| {max_d} LSB vs golden (bound 12)")
        if max_d > 12:
            failures.append(f"psnr_fsr_db: max|diff| {max_d} LSB > 12 vs golden")
        return psnr(out, golden)

    gate("psnr_fsr_db", 40.0, _g_fsr)

    # 3) the headline fused-blend kernel's mid frame vs the blend of the two
    #    resample goldens (cross-fade commutes with linear resampling)
    def _g_blend():
        from nu_scaler_tpu.kernels.resample_pallas import make_pallas_fused_blend

        fb = make_pallas_fused_blend(IN_H, IN_W, OUT_H, OUT_W, "lanczos3", (0.5,))
        if fb is not None:
            prev_up2d = fb(dev_a, jnp.zeros(fb.out2d, jnp.uint8))[0]
            mid2d = np.asarray(fb(dev_b, prev_up2d)[1])
            mid = mid2d[:OUT_H, : OUT_W * 4].reshape(OUT_H, OUT_W, 4)
        else:
            # no Pallas on this backend: the headline falls back to the
            # amortized XLA blend — gate that path instead
            up = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")
            mid = np.asarray(interp.blend_only(up(dev_a), up(dev_b), 0.5))
        ga = ref.separable_resample_ref(frame, OUT_H, OUT_W, "lanczos3")
        gb = ref.separable_resample_ref(cur, OUT_H, OUT_W, "lanczos3")
        gm = np.clip(
            np.round((ga.astype(np.float64) + gb.astype(np.float64)) * 0.5),
            0,
            255,
        ).astype(np.uint8)
        return psnr(mid, gm)

    gate("psnr_blend_db", 50.0, _g_blend)

    # 4) the Pallas overlapped-tile soft warp vs the XLA soft path fed the
    #    SAME tile-mean motion (the full-res pixel-loop numpy golden takes
    #    minutes; the XLA twin is itself golden-gated in
    #    tests/test_soft_warp_pallas.py). Both run on-chip here.
    def _g_flow_soft():
        from nu_scaler_tpu.kernels.soft_warp_pallas import soft_warp_blend

        th, tw = interp.WARP_TILE
        tiles = interp.flow_tiles_fast(dev_a, dev_b, interp.WARP_TILE)
        dense = jnp.repeat(jnp.repeat(tiles, th, axis=0), tw, axis=1)
        out_k = np.asarray(
            soft_warp_blend(
                dev_a, dev_b, None, 0.5,
                tile=interp.WARP_TILE, rng=interp.WARP_RANGE, tiles=tiles,
            )
        )
        out_x = np.asarray(
            interp.warp_blend_fast(
                dev_a, dev_b, dense, 0.5,
                tile=interp.WARP_TILE, overlap=True, pallas_ok=False,
            )
        )
        # alpha is MC'd by the kernel, cross-faded by the twin (identical on
        # alpha≡255 frames) — gate RGB
        return psnr(out_k[..., :3], out_x[..., :3])

    gate("psnr_flow_soft_db", 50.0, _g_flow_soft)

    # 5) the fused phase-domain refined path vs its d2s-composition twin
    #    (contract: the phase fold is exact up to f32 rounding ties)
    try:
        from nu_scaler_tpu.models.interp_refine import (
            get_refine_graph,
            refine_available,
        )

        have_refine = refine_available() and interp.refine_serves(IN_H, IN_W)
    except Exception:  # noqa: BLE001
        have_refine = False
    if have_refine:

        def _g_refined():
            fused = interp.make_refined_mid_upscaler(IN_H, IN_W, OUT_H, OUT_W)
            got = np.asarray(fused(dev_a, dev_b, 0.5))
            rg = get_refine_graph(IN_H, IN_W)
            up = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")
            mid = interp.soft_interp_fast(dev_a, dev_b, 0.5)
            want = np.asarray(up(rg(dev_a, dev_b, mid)))
            return psnr(got, want)

        gate("psnr_flow_soft_ref_db", 50.0, _g_refined)
    else:
        log("fidelity[psnr_flow_soft_ref_db] skipped: no refine checkpoint")

    # 6) the learned tier's served grid (fused raw-domain graph, int8 trunk
    #    when calibrated) vs its float-domain twin on the same integer grid.
    #    Raw-domain bf16 (ulp 1 at 255) vs [0,1]-domain (ulp ~0.004) leaves
    #    ~1 LSB of association noise — the same comparison test_esrgan.py
    #    gates at >=42 dB on random init; the trained checkpoint measures
    #    higher.
    try:
        from nu_scaler_tpu.models import esrgan_lite as el
        from nu_scaler_tpu.models import train as etrain

        efn = el.make_pretrained_upscaler(IN_H, IN_W, OUT_H, OUT_W)
        have_esrgan = efn is not None and getattr(efn, "arch", None)
    except Exception:  # noqa: BLE001
        have_esrgan = False
    if have_esrgan:

        def _g_esrgan():
            arch = efn.arch
            arch_kw = {e[0]: e[1] for e in el._ARCH_LADDER["quality"]}.get(
                arch, dict(stride=4, features=128)
            )
            params, step = etrain.load_checkpoint(1, arch)
            model = el.ESRGANLiteTPU(upscale=2, **arch_kw)
            if getattr(efn, "quantized", False):
                twin_fn = el.make_quant_apply(
                    model, params, etrain.load_act_scales(1, arch, step)
                )
            else:
                twin_fn = jax.jit(lambda x: model.apply(params, x))
            served = np.asarray(efn(dev_a))
            lr01 = jnp.asarray(frame[None, ..., :3].astype(np.float32) / 255.0)
            twin = np.asarray(twin_fn(lr01))[0]
            twin_u8 = np.clip(np.round(twin * 255.0), 0, 255).astype(np.uint8)
            return psnr(served[..., :3], twin_u8)

        gate("psnr_esrgan_db", 42.0, _g_esrgan)
    else:
        log("fidelity[psnr_esrgan_db] skipped: no esrgan checkpoint")

    # 7) the 4x tier's served grid vs its numeric twin — same contract as
    #    (6), at the x4 serving point (stages=2 checkpoint; 540p→4K at
    #    bench dims — derived from OUT so the CPU-mesh test dims scale)
    in4_h, in4_w = OUT_H // 4, OUT_W // 4
    try:
        e4fn = (
            el.make_pretrained_upscaler(in4_h, in4_w, OUT_H, OUT_W)
            if have_esrgan
            else None
        )
        have_x4 = e4fn is not None and getattr(e4fn, "arch", "lite") != "lite"
    except Exception:  # noqa: BLE001
        have_x4 = False
    if have_x4:
        frame4 = generate_test_pattern(in4_w, in4_h)
        dev_4 = jax.device_put(frame4)

        def _g_esrgan_x4():
            arch = e4fn.arch
            arch_kw = {e[0]: e[1] for e in el._ARCH_LADDER["quality"]}.get(
                arch, dict(stride=4, features=128)
            )
            params, step = etrain.load_checkpoint(2, arch)
            model = el.ESRGANLiteTPU(upscale=4, **arch_kw)
            if getattr(e4fn, "quantized", False):
                twin_fn = el.make_quant_apply(
                    model, params, etrain.load_act_scales(2, arch, step)
                )
            else:
                twin_fn = jax.jit(lambda x: model.apply(params, x))
            served = np.asarray(e4fn(dev_4))
            lr01 = jnp.asarray(frame4[None, ..., :3].astype(np.float32) / 255.0)
            twin = np.asarray(twin_fn(lr01))[0]
            twin_u8 = np.clip(np.round(twin * 255.0), 0, 255).astype(np.uint8)
            return psnr(served[..., :3], twin_u8)

        gate("psnr_esrgan_x4_db", 42.0, _g_esrgan_x4)
    else:
        log("fidelity[psnr_esrgan_x4_db] skipped: no x4 checkpoint")


def bench_upscale(algorithm: str, iters: int, overhead_s: float) -> float:
    up = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, algorithm)

    def body(state):
        return chain_next(state, up(state))

    spf = timed_loop(body, jax.device_put(make_input()), iters, overhead_s)
    return 1.0 / spf


def bench_fsr(iters: int, overhead_s: float) -> float:
    fn = fsr_ops.make_fsr_upscaler(IN_H, IN_W, OUT_H, OUT_W, "quality")

    def body(state):
        return chain_next(state, fn(state))

    spf = timed_loop(body, jax.device_put(make_input()), iters, overhead_s)
    return 1.0 / spf


_TRANSIENT = ("remote_compile", "read body", "DEADLINE", "UNAVAILABLE")


def bench_pipeline_retry(mode: str, iters: int, overhead_s: float) -> dict:
    """bench_pipeline with ONE retry on transient tunnel/remote-compile
    errors (the r4 full run lost hs-flow's number to a mid-compile
    'response body closed' hiccup). Real failures still raise."""
    try:
        return bench_pipeline(mode, iters, overhead_s)
    except Exception as e:  # noqa: BLE001
        if not any(s in str(e) for s in _TRANSIENT):
            raise
        log(f"pipeline[{mode}] transient failure, retrying once: {e}")
        return bench_pipeline(mode, iters, overhead_s)


def main() -> None:
    dev = jax.devices()[0]
    gate_failures: list[str] = []
    log(f"device: {dev} ({dev.platform})")
    overhead = fetch_overhead_s()
    log(f"host<->device fetch overhead: {overhead*1000:.2f} ms (diagnostic only; slope timing cancels it)")
    iters = 100 if dev.platform == "tpu" else 5

    try:
        res_blend = bench_pipeline_retry("blend_amortized", iters, overhead)
        log(f"pipeline[blend  ] {res_blend['fps']:9.1f} out-fps  {res_blend['step_ms']:.3f} ms/step (amortized)")
    except Exception as e:  # noqa: BLE001
        res_blend = {"fps": 0.0, "step_ms": 0.0}
        log(f"pipeline[blend] failed: {e}")
    try:
        res_blend_fused = bench_pipeline_retry("blend_fused", iters, overhead)
        log(f"pipeline[blend-f] {res_blend_fused['fps']:9.1f} out-fps  {res_blend_fused['step_ms']:.3f} ms/step (blend fused into the resample kernel)")
    except Exception as e:  # noqa: BLE001
        res_blend_fused = {"fps": 0.0}
        log(f"pipeline[blend-f] failed: {e}")
    try:
        res_blend3x = bench_pipeline_retry("blend_fused_3x", iters, overhead)
        log(f"pipeline[blend-3x] {res_blend3x['fps']:9.1f} out-fps  {res_blend3x['step_ms']:.3f} ms/step (3x frame gen, fused kernel)")
    except Exception as e:  # noqa: BLE001
        res_blend3x = {"fps": 0.0}
        log(f"pipeline[blend-3x] failed: {e}")
    try:
        res_blend_naive = bench_pipeline_retry("blend", iters, overhead)
        log(f"pipeline[blend-2x] {res_blend_naive['fps']:9.1f} out-fps  {res_blend_naive['step_ms']:.3f} ms/step (pair-upscale)")
    except Exception as e:  # noqa: BLE001
        res_blend_naive = {"fps": 0.0}
        log(f"pipeline[blend-2x] failed: {e}")
    try:
        res_flow = bench_pipeline_retry("flow", max(iters // 4, 3), overhead)
        log(f"pipeline[hs-flow] {res_flow['fps']:9.1f} out-fps  {res_flow['step_ms']:.3f} ms/step")
    except Exception as e:  # noqa: BLE001
        res_flow = {"fps": 0.0}
        log(f"pipeline[hs-flow] failed: {e}")
    try:
        res_flow_soft = bench_pipeline_retry("flow_soft", max(iters // 4, 3), overhead)
        log(f"pipeline[hs-soft] {res_flow_soft['fps']:9.1f} out-fps  {res_flow_soft['step_ms']:.3f} ms/step (overlapped-tile warp)")
    except Exception as e:  # noqa: BLE001
        res_flow_soft = {"fps": 0.0}
        log(f"pipeline[hs-soft] failed: {e}")
    res_soft_ref = {"fps": 0.0}
    interp_ref_quality = {}
    try:
        from nu_scaler_tpu.models.interp_refine import refine_available

        if refine_available():
            res_soft_ref = bench_pipeline_retry("flow_soft_ref", max(iters // 4, 3), overhead)
            log(
                f"pipeline[hs-soft-ref] {res_soft_ref['fps']:9.1f} out-fps  "
                f"{res_soft_ref['step_ms']:.3f} ms/step (soft warp + learned refinement)"
            )
            from nu_scaler_tpu.models.data import eval_interp_refinement

            q = eval_interp_refinement(seeds=(900, 901))
            interp_ref_quality = {
                "interp_ref_psnr_delta_db_vs_soft": round(q["psnr_delta_db"], 2),
                "interp_ref_ssim_delta_vs_soft": round(q["ssim_delta"], 4),
            }
            log(
                f"interp refinement held-out: {q['ref_psnr_db']:.2f} dB vs soft "
                f"{q['soft_psnr_db']:.2f} dB (Δ {q['psnr_delta_db']:+.2f} dB, "
                f"ΔSSIM {q['ssim_delta']:+.4f})"
            )
    except Exception as e:  # noqa: BLE001
        log(f"pipeline[hs-soft-ref] failed: {e}")
    try:
        res_soft3x = bench_pipeline_retry("soft3x", max(iters // 4, 3), overhead)
        log(f"pipeline[hs-soft3x] {res_soft3x['fps']:9.1f} out-fps  {res_soft3x['step_ms']:.3f} ms/step (3x frame gen, one motion solve)")
    except Exception as e:  # noqa: BLE001
        res_soft3x = {"fps": 0.0}
        log(f"pipeline[hs-soft3x] failed: {e}")
    res_soft3x_ref = {"fps": 0.0}
    try:
        from nu_scaler_tpu.models.interp_refine import refine_available

        if refine_available():
            res_soft3x_ref = bench_pipeline_retry("soft3x_ref", max(iters // 4, 3), overhead)
            log(
                f"pipeline[hs-soft3x-ref] {res_soft3x_ref['fps']:9.1f} out-fps  "
                f"{res_soft3x_ref['step_ms']:.3f} ms/step (3x frame gen + learned refinement)"
            )
    except Exception as e:  # noqa: BLE001
        log(f"pipeline[hs-soft3x-ref] failed: {e}")
    try:
        res_flow_half = bench_pipeline_retry("flow_half", max(iters // 5, 3), overhead)
        log(f"pipeline[hs-half] {res_flow_half['fps']:9.1f} out-fps  {res_flow_half['step_ms']:.3f} ms/step")
    except Exception as e:  # noqa: BLE001
        res_flow_half = {"fps": 0.0}
        log(f"pipeline[hs-half] failed: {e}")
    try:
        res_perf = bench_pipeline_retry("perf_interp", max(iters // 4, 3), overhead)
        log(f"pipeline[hs-perf] {res_perf['fps']:9.1f} out-fps  {res_perf['step_ms']:.3f} ms/step")
    except Exception as e:  # noqa: BLE001
        res_perf = {"fps": 0.0}
        log(f"pipeline[hs-perf] failed: {e}")

    try:
        res_live = bench_live(n_frames=10 if dev.platform == "tpu" else 4)
        log(
            f"pipeline[live   ] {res_live['fps']:9.1f} out-fps generated / "
            f"{res_live['presented_fps']:.1f} presented ({res_live['delivery']}, "
            f"{res_live['payload_mb_in']} MB in + {res_live['payload_mb_out']} MB/frame out; "
            f"p50 {res_live['p50_step_ms']:.1f} / p99 {res_live['p99_step_ms']:.1f} ms/step, "
            f"{res_live['presented']} presented / {res_live['skipped']} skipped of "
            f"{res_live['output_frames']}) — capture→interp→upscale→present"
        )
    except Exception as e:  # noqa: BLE001
        res_live = {
            "fps": 0.0, "presented_fps": 0.0, "p50_step_ms": 0.0,
            "p99_step_ms": 0.0, "skipped": 0, "presented": 0,
            "output_frames": 0, "delivery": "?", "payload_mb_in": 0.0,
            "payload_mb_out": 0.0, "target_fps": 0.0,
        }
        log(f"pipeline[live] failed: {e}")
    try:
        # preview delivery: the reference GUI only ever presented a
        # preview-sized QPixmap (main.py:1117-1173) — 4:2:0 at 1080 rows
        # is the realistic GUI payload (4× fewer bytes than 4K 4:2:0); the
        # full-res 4:2:0 line above remains the file/stream-sink number
        res_live_prev = bench_live(
            n_frames=10 if dev.platform == "tpu" else 4, preview_h=1080
        )
        log(
            f"pipeline[live-pv] {res_live_prev['fps']:9.1f} out-fps generated / "
            f"{res_live_prev['presented_fps']:.1f} presented ({res_live_prev['delivery']}, "
            f"{res_live_prev['payload_mb_in']} MB in + {res_live_prev['payload_mb_out']} MB/frame out; "
            f"{res_live_prev['presented']} presented / {res_live_prev['skipped']} skipped of "
            f"{res_live_prev['output_frames']}) — preview-resolution delivery"
        )
    except Exception as e:  # noqa: BLE001
        res_live_prev = {
            "fps": 0.0, "presented_fps": 0.0, "delivery": "?",
            "presented": 0, "skipped": 0, "output_frames": 0,
        }
        log(f"pipeline[live-pv] failed: {e}")
    try:
        # the pre-r4 full-delivery loop: full-res RGBA, every frame fetched
        res_live_rgba = bench_live(
            n_frames=4 if dev.platform == "tpu" else 2,
            fmt="rgba", adaptive=False,
        )
        log(
            f"pipeline[live-rgba] {res_live_rgba['fps']:7.2f} out-fps "
            f"(full 4K RGBA, every frame fetched — the r3 comparison line)"
        )
    except Exception as e:  # noqa: BLE001
        res_live_rgba = {"fps": 0.0}
        log(f"pipeline[live-rgba] failed: {e}")

    extras = {}
    for algo in ("bilinear", "lanczos3", "bicubic"):
        try:
            fps = bench_upscale(algo, iters, overhead)
            extras[f"upscale_{algo}_fps"] = round(fps, 1)
            log(f"upscale[{algo:9}] 1080p→4K {fps:9.1f} fps")
        except Exception as e:  # noqa: BLE001
            log(f"upscale[{algo}] failed: {e}")

    # on-chip fidelity evidence: every production output path is PSNR-gated
    # against its numpy golden or on-chip twin ON THIS DEVICE — TPU-specific
    # numerics (split_bf16 matmuls, Mosaic trunc packing, int8 requant) are
    # exactly what differs on-chip. HARD gate: failures are collected in
    # `gate_failures` and fail the run with exit code 1 AFTER the JSON line
    # (VERDICT r3 #1 — the old assert sat inside its own swallowing except).
    run_fidelity_gates(extras, gate_failures)

    # Pallas fused kernel (experimental) vs the XLA banded path
    try:
        from nu_scaler_tpu.kernels.resample_pallas import make_pallas_resampler

        pfn = make_pallas_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")
        if pfn is not None:
            def pbody(state):
                return chain_next(state, pfn(state))

            spf = timed_loop(pbody, jax.device_put(make_input()), iters, overhead)
            extras["pallas_twocall_lanczos3_fps"] = round(1.0 / spf, 1)
            log(f"upscale[pallas-2call] 1080p→4K {1.0/spf:9.1f} fps (legacy; the fused kernel IS the lanczos3 line)")
    except Exception as e:  # noqa: BLE001
        log(f"pallas resample bench failed: {str(e)[:200]}")
    try:
        fps = bench_fsr(iters, overhead)
        extras["fsr_easu_rcas_fps"] = round(fps, 1)
        log(f"upscale[fsr      ] 1080p→4K {fps:9.1f} fps")
    except Exception as e:  # noqa: BLE001
        log(f"fsr bench failed: {e}")

    # learned tier: serving fps + held-out quality vs lanczos3 (VERDICT r1 #3)
    efn = None
    try:
        from nu_scaler_tpu.models import esrgan_lite as el

        efn = el.make_pretrained_upscaler(IN_H, IN_W, OUT_H, OUT_W)

        def ebody(state):
            return chain_next(state, efn(state))

        # the gate metric (esrgan_fps >= 240): true serving rate sits within
        # ~1 fps of the gate, so sample it hardest (50-step chains x 5
        # interleaved repeats per trip count)
        spf = timed_loop(
            ebody, jax.device_put(make_input()), max(iters // 2, 3), overhead,
            repeats=5,
        )
        extras["esrgan_fps"] = round(1.0 / spf, 1)
        arch = getattr(efn, "arch", "?")
        if getattr(efn, "quantized", False):
            arch += "-int8"
        log(f"upscale[esrgan   ] 1080p→4K {extras['esrgan_fps']:9.1f} fps (learned tier, {arch})")

        # NOTE: no batch=2 line — single-chip batching is a measured
        # negative at these shapes (3.805 vs 3.226 ms/frame on the honest
        # pair, tools/experiments/esrgan_batch_honest.py r4); the batched
        # program exists for mesh dp fan-out (esrgan_batch_sharded) and
        # API grouping, not as a single-chip speed knob
    except Exception as e:  # noqa: BLE001
        log(f"esrgan bench failed: {e}")
    # performance learned tier (stride-8 ladder: NuScaler("dlss","performance"))
    try:
        ffn = el.make_fast_upscaler(IN_H, IN_W, OUT_H, OUT_W)
        if getattr(ffn, "arch", None) in ("tpu4b1", "tpu8", "tpu8w"):

            def fbody(state):
                return chain_next(state, ffn(state))

            spf = timed_loop(fbody, jax.device_put(make_input()), max(iters // 4, 3), overhead)
            extras["esrgan_fast_fps"] = round(1.0 / spf, 1)
            _fa = ffn.arch + ("-int8" if getattr(ffn, "quantized", False) else "")
            log(
                f"upscale[esrgan-pf] 1080p→4K {extras['esrgan_fast_fps']:9.1f} fps "
                f"(performance learned tier, {_fa})"
            )
    except Exception as e:  # noqa: BLE001
        log(f"esrgan fast bench failed: {e}")
    try:
        from nu_scaler_tpu.models.data import eval_vs_lanczos3

        # evaluate the arch the quality tier actually serves (ladder head),
        # on the SAME numeric path it serves: the int8 integer-grid twin
        # when the tier is quantized, the plain float apply otherwise
        served_arch = getattr(efn, "arch", None) or "tpu4"
        arch_kw = {e[0]: e[1] for e in el._ARCH_LADDER["quality"]}.get(
            served_arch, dict(stride=4, features=128)
        )
        _tr = __import__("nu_scaler_tpu.models.train", fromlist=["load_checkpoint"])
        _params, _step = _tr.load_checkpoint(1, served_arch)
        _model = el.ESRGANLiteTPU(upscale=2, **arch_kw)
        if getattr(efn, "quantized", False):
            model_fn = el.make_quant_apply(
                _model, _params, _tr.load_act_scales(1, served_arch, _step)
            )
        else:
            model_fn = jax.jit(lambda x: _model.apply(_params, x))
        q = eval_vs_lanczos3(model_fn, scale=2, seeds=(900, 901))
        extras["esrgan_psnr_delta_db_vs_lanczos3"] = round(q["psnr_delta_db"], 2)
        extras["esrgan_ssim_delta_vs_lanczos3"] = round(q["ssim_delta"], 4)
        log(
            f"esrgan held-out quality: {q['net_psnr_db']:.2f} dB vs lanczos3 "
            f"{q['lanczos3_psnr_db']:.2f} dB (Δ {q['psnr_delta_db']:+.2f} dB, "
            f"ΔSSIM {q['ssim_delta']:+.4f})"
        )
    except Exception as e:  # noqa: BLE001
        log(f"esrgan quality eval skipped: {e}")

    # 4x learned tier (540p -> 4K, stages=2): the DLSS ultra-performance
    # role (dlss-sys quality mode grid). Same chain_next harness; quality
    # eval runs on the exact served numeric grid (int8 twin when quantized).
    try:
        e4 = el.make_pretrained_upscaler(540, 960, OUT_H, OUT_W)
        if getattr(e4, "arch", "lite") != "lite":

            def e4body(state):
                return chain_next(state, e4(state))

            x4_in = generate_test_pattern(960, 540)
            spf = timed_loop(
                e4body, jax.device_put(x4_in), max(iters // 4, 3), overhead
            )
            extras["esrgan_x4_fps"] = round(1.0 / spf, 1)
            _a4 = e4.arch + ("-int8" if getattr(e4, "quantized", False) else "")
            log(
                f"upscale[esrgan-x4] 540p→4K  {extras['esrgan_x4_fps']:9.1f} fps "
                f"(4x learned tier, {_a4})"
            )
            _p4, _s4 = _tr.load_checkpoint(2, e4.arch)
            _kw4 = {en[0]: en[1] for en in el._ARCH_LADDER["quality"]}.get(
                e4.arch, dict(stride=4, features=128)
            )
            _m4 = el.ESRGANLiteTPU(upscale=4, **_kw4)
            if getattr(e4, "quantized", False):
                mf4 = el.make_quant_apply(
                    _m4, _p4, _tr.load_act_scales(2, e4.arch, _s4)
                )
            else:
                mf4 = jax.jit(lambda x: _m4.apply(_p4, x))
            q4 = eval_vs_lanczos3(mf4, scale=4, seeds=(900, 901))
            extras["esrgan_x4_psnr_delta_db_vs_lanczos3"] = round(
                q4["psnr_delta_db"], 2
            )
            log(
                f"esrgan-x4 held-out quality: {q4['net_psnr_db']:.2f} dB vs "
                f"lanczos3 {q4['lanczos3_psnr_db']:.2f} dB "
                f"(Δ {q4['psnr_delta_db']:+.2f} dB, ΔSSIM {q4['ssim_delta']:+.4f})"
            )
    except Exception as e:  # noqa: BLE001
        log(f"esrgan x4 bench skipped: {e}")

    # headline = the best full-pipeline implementation of the north-star
    # dataflow; blend-f computes the identical two output frames per step
    # (upscale bit-exact, blend ±1 on f32 rounding ties) in one fused kernel
    res_head = res_blend_fused if res_blend_fused["fps"] > res_blend["fps"] else res_blend
    value = round(res_head["fps"], 1)
    print(
        json.dumps(
            {
                "metric": "1080p→4K lanczos3 + 2x interp, output frames/sec/chip",
                "value": value,
                "unit": "fps",
                "vs_baseline": round(value / TARGET_FPS, 3),
                "step_ms": round(res_head["step_ms"], 3),
                "blend_amortized_xla_fps": round(res_blend["fps"], 1),
                "blend_pair_upscale_fps": round(res_blend_naive["fps"], 1),
                "blend_fused_kernel_fps": round(res_blend_fused["fps"], 1),
                "blend_fused_3x_fps": round(res_blend3x["fps"], 1),
                "flow_mode_fps": round(res_flow["fps"], 1),
                "flow_soft_fps": round(res_flow_soft["fps"], 1),
                "flow_soft_ref_fps": round(res_soft_ref["fps"], 1),
                "flow_soft_3x_fps": round(res_soft3x["fps"], 1),
                "flow_soft_3x_ref_fps": round(res_soft3x_ref["fps"], 1),
                "flow_half_fps": round(res_flow_half["fps"], 1),
                "perf_interp_fps": round(res_perf["fps"], 1),
                "live_host_fps": round(res_live["fps"], 2),
                "live_presented_fps": round(res_live["presented_fps"], 2),
                "live_presented": res_live["presented"],
                "live_skipped": res_live["skipped"],
                "live_output_frames": res_live["output_frames"],
                "live_delivery": res_live["delivery"],
                "live_payload_mb_in": res_live["payload_mb_in"],
                "live_payload_mb_out": res_live["payload_mb_out"],
                "live_preview_fps": round(res_live_prev["fps"], 2),
                "live_preview_presented_fps": round(
                    res_live_prev["presented_fps"], 2
                ),
                "live_preview_delivery": res_live_prev["delivery"],
                "live_full_rgba_fps": round(res_live_rgba["fps"], 2),
                "live_p50_step_ms": round(res_live["p50_step_ms"], 1),
                "live_p99_step_ms": round(res_live["p99_step_ms"], 1),
                "platform": dev.platform,
                "fidelity_gate": (
                    "pass" if not gate_failures else "FAIL: " + "; ".join(gate_failures)
                ),
                **interp_ref_quality,
                **extras,
            }
        )
    )
    if gate_failures:
        log("FIDELITY GATE FAILURES (exiting non-zero):")
        for f in gate_failures:
            log("  " + f)
        sys.exit(1)


if __name__ == "__main__":
    if "--gates" in sys.argv:
        # fidelity gates only (fast validation path; same hard-exit contract)
        _extras: dict = {}
        _fails: list[str] = []
        run_fidelity_gates(_extras, _fails)
        print(
            json.dumps(
                {
                    "metric": "on-chip fidelity gates",
                    "unit": "dB",
                    "fidelity_gate": (
                        "pass" if not _fails else "FAIL: " + "; ".join(_fails)
                    ),
                    **_extras,
                }
            )
        )
        sys.exit(1 if _fails else 0)
    main()
