"""BASELINE.json configs #2/#3: batch-upscale a PNG frame sequence
(720p→1440p lanczos3+bicubic) and 30→60 fps interpolation over it.

Generates a synthetic sequence when no --frames dir is given.

    python -m tools.sequence_bench --count 300 --cpu
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def synth_sequence(count: int, w: int = 1280, h: int = 720):
    from nu_scaler_tpu.capture.sources import SyntheticSource

    src = SyntheticSource(w, h)
    return [src.next_frame() for _ in range(count)]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", default=None, help="dir of PNG frames (else synthetic)")
    p.add_argument("--count", type=int, default=300)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nu_scaler_tpu.ops import interpolate, resample

    if args.frames:
        from nu_scaler_tpu.capture.sources import FileSource

        src = FileSource(args.frames)
        frames = [src.next_frame() for _ in range(args.count)]
    else:
        frames = synth_sequence(args.count)
    h, w = frames[0].shape[:2]
    oh, ow = h * 2, w * 2
    print(f"{len(frames)} frames {w}x{h} → {ow}x{oh}")

    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s() if jax.devices()[0].platform == "tpu" else 0.0
    for algo in ("lanczos3", "bicubic"):
        fn = resample.make_resampler(h, w, oh, ow, algo)
        fn(jnp.asarray(frames[0])).block_until_ready()  # compile
        t0 = time.perf_counter()
        outs = []
        for i in range(0, len(frames), args.batch):
            chunk = np.stack(frames[i : i + args.batch])
            outs.append(fn(jnp.asarray(chunk)))
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        print(
            f"batch upscale [{algo}]: {len(frames)/dt:8.1f} fps wall "
            f"(incl. host→device transfer; the dev tunnel adds ~29 ms/dispatch)"
        )
        # device-resident throughput (chained loop, one fetch)
        batch0 = jax.device_put(np.stack(frames[: args.batch]))
        spb = device_timer(
            lambda s, fn=fn: jnp.clip(
                fn(s).astype(jnp.float32)[:, :h, :w, :], 0, 255
            ).astype(jnp.uint8),
            batch0,
            iters=10,
            overhead_s=ov,
        )
        print(f"batch upscale [{algo}]: {args.batch/spb:8.1f} fps device-resident")

    # 30→60fps interpolation (blend path)
    fn_i = interpolate.make_interpolator(h, w, "blend")
    fn_i(jnp.asarray(frames[0]), jnp.asarray(frames[1]), 0.5).block_until_ready()
    t0 = time.perf_counter()
    mids = []
    for a, b in zip(frames[:-1], frames[1:]):
        mids.append(fn_i(jnp.asarray(a), jnp.asarray(b), 0.5))
    jax.block_until_ready(mids)
    dt = time.perf_counter() - t0
    print(f"interpolation 30→60: {len(mids)/dt:8.1f} mid-frames/s")

    if args.out_dir:
        from PIL import Image

        os.makedirs(args.out_dir, exist_ok=True)
        for i, o in enumerate(outs[0][: min(8, args.batch)]):
            Image.fromarray(np.asarray(o), "RGBA").save(
                os.path.join(args.out_dir, f"up_{i:04d}.png")
            )
        print(f"wrote samples to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
