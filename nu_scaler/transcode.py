"""Batch video transcode: Y4M in → upscaled (and optionally frame-rate
multiplied) Y4M out — the offline production counterpart of the live loop.

The reference only ever shipped the real-time path (capture → upscale →
present, `nu_scaler_py/nu_scaler/main.py:951-1111`); its FSR3 tier sketches
exactly this dataflow offline — motion-compensated in-between frames from
one motion solve per pair (`Nu_scale/src/upscale/fsr3.rs:319-376`) — but
nothing in the repo can process a clip end-to-end. This module does:

    nu-scaler transcode in.y4m out.y4m --scale 2 --factor 2 \
        --algorithm lanczos3 --interp-mode flow_soft

reads C420 Y4M (ffmpeg interchange: `ffmpeg -i clip.mp4 -pix_fmt yuv420p
clip.y4m`), upscales every frame through the same technology tiers as the
live loop (wgpu classical / fsr EASU+RCAS / dlss learned int8), multiplies
the frame rate with one motion solve per input pair
(`interpolate_multi_py`), and writes C420 Y4M at scale×resolution and
factor×fps.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

import nu_scaler_core
from nu_scaler_tpu.capture.video import Y4MReader, Y4MWriter


def _make_upscaler(technology: str, quality: str, algorithm: str):
    """Per-technology upscaler selection — same mapping as the live loop
    (nu_scaler/live.py, reference main.py:888-949 combo-box wiring)."""
    technology = (technology or "wgpu").lower()
    if technology == "fsr":
        return nu_scaler_core.create_fsr_upscaler(quality)
    if technology == "dlss":
        up = nu_scaler_core.PyAdvancedWgpuUpscaler("ultra", algorithm, True)
        if quality in ("performance", "balanced"):
            up.learned_prefer = "performance"
        return up
    return nu_scaler_core.PyWgpuUpscaler(quality, algorithm)


def transcode(
    input_path: str,
    output_path: str,
    *,
    scale: float = 2.0,
    algorithm: str = "lanczos3",
    technology: str = "wgpu",
    quality: str = "quality",
    factor: int = 1,
    interp_mode: str = "flow_soft",
    limit: Optional[int] = None,
    progress: Optional[Callable[[int, int], None]] = None,
    batch: int = 1,
) -> dict:
    """Upscale (and frame-rate multiply) a Y4M clip file-to-file.

    factor N emits N-1 motion-interpolated frames per input pair (one
    motion solve each — mids at t = 1/N .. (N-1)/N), so output fps =
    input fps × N and output frame count = N·(n_in − 1) + 1.

    batch N groups N frames into ONE device program per upscale dispatch
    (`upscale_batch`) — fewer host↔device round trips, and on a
    multi-chip mesh the group shards data-parallel (N chips ≈ N×
    throughput, `mesh.esrgan_batch_sharded`). On a SINGLE chip the
    batched program itself is timing-neutral-to-negative at 4K serving
    shapes (the graph already saturates the MXU — measured r4,
    tools/experiments/esrgan_batch_honest.py), so the win here is
    dispatch/transfer grouping, not kernel time. The final short group
    pads to the steady batch size so only one batched program ever
    compiles.

    Returns a stats dict (frames in/out, dims, wall seconds, output fps).
    """
    if factor < 1:
        raise ValueError(f"factor must be ≥ 1, got {factor}")
    if batch < 1:
        raise ValueError(f"batch must be ≥ 1, got {batch}")
    reader = Y4MReader(input_path)
    w, h = reader.width, reader.height
    out_w, out_h = int(w * scale), int(h * scale)

    upscaler = _make_upscaler(technology, quality, algorithm)
    upscaler.initialize(w, h, out_w, out_h)
    interp = (
        nu_scaler_core.WgpuFrameInterpolator(mode=interp_mode)
        if factor > 1
        else None
    )
    ts = tuple(k / factor for k in range(1, factor))

    writer = Y4MWriter(output_path, out_w, out_h, fps=reader.fps * factor)
    n_in = n_out = 0
    prev: Optional[bytes] = None
    t0 = time.perf_counter()

    pending: list = []

    def _write(out: bytes) -> None:
        nonlocal n_out
        writer.write(np.frombuffer(out, np.uint8).reshape(out_h, out_w, 4))
        n_out += 1

    def flush() -> None:
        if not pending:
            return
        k = len(pending)
        # pad the final short group to the steady batch size: one compiled
        # program for the whole run (a k<batch group would compile a second)
        group = pending + [pending[-1]] * (batch - k)
        for out in upscaler.upscale_batch(group)[:k]:
            _write(out)
        pending.clear()

    def emit(frame_bytes: bytes) -> None:
        if batch <= 1:
            _write(upscaler.upscale(frame_bytes))
            return
        pending.append(frame_bytes)
        if len(pending) == batch:
            flush()

    try:
        for frame in reader:
            data = frame.tobytes()
            if interp is not None and prev is not None:
                for mid in interp.interpolate_multi_py(prev, data, w, h, times=ts):
                    emit(mid)
            emit(data)
            prev = data
            n_in += 1
            if progress is not None:
                progress(n_in, n_out)
            if limit is not None and n_in >= limit:
                break
        flush()
    finally:
        writer.close()
        reader.close()

    wall = time.perf_counter() - t0
    return {
        "frames_in": n_in,
        "frames_out": n_out,
        "in_size": (w, h),
        "out_size": (out_w, out_h),
        "in_fps": reader.fps,
        "out_fps": reader.fps * factor,
        "wall_s": round(wall, 3),
        "throughput_fps": round(n_out / wall, 2) if wall > 0 else 0.0,
        "technology": (technology or "wgpu").lower(),
        "algorithm": algorithm,
        "factor": factor,
        "batch": batch,
    }


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="nu-scaler-transcode", description=__doc__)
    p.add_argument("input", help="input .y4m (C420)")
    p.add_argument("output", help="output .y4m")
    p.add_argument("--scale", type=float, default=2.0)
    p.add_argument("--algorithm", default="lanczos3")
    p.add_argument("--tech", default="wgpu",
                   choices=["wgpu", "fsr", "dlss", "fallback"])
    p.add_argument("--quality", default="quality",
                   choices=["ultra", "quality", "balanced", "performance"])
    p.add_argument("--factor", type=int, default=1,
                   help="frame-rate multiplier (N-1 MC mids per input pair)")
    p.add_argument("--interp-mode", default="flow_soft",
                   choices=["blend", "flow", "flow_soft", "flow_soft_ref"])
    p.add_argument("--limit", type=int, default=None,
                   help="stop after N input frames")
    p.add_argument("--batch", type=int, default=1,
                   help="frames per upscale dispatch (one device program "
                        "per group — offline throughput, N× latency)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend "
                   "(the site config pins JAX_PLATFORMS=axon)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    def prog(n_in: int, n_out: int) -> None:
        if n_in % 30 == 0:
            print(f"  {n_in} frames in / {n_out} out", flush=True)

    stats = transcode(
        args.input, args.output,
        scale=args.scale, algorithm=args.algorithm, technology=args.tech,
        quality=args.quality, factor=args.factor, interp_mode=args.interp_mode,
        limit=args.limit, progress=prog, batch=args.batch,
    )
    print(stats)
    return 0 if stats["frames_out"] > 0 else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())
