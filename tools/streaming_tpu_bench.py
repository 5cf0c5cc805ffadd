"""Host→device streaming demo (VERDICT r1 weak #8): sustained throughput of
the double-buffered streaming pipeline with REAL per-frame host delivery.

Three measurements at 1080p→4K lanczos3:
  1. H2D only: pipelined jax.device_put of distinct host frames
  2. stream: per-frame device_put → upscale → result stays device-resident
     (one checksum fetch at the end)
  3. stream+D2H: same but every output frame is fetched back to the host
     (the reference's blocking-readback dataflow, for contrast)

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/streaming_tpu_bench.py
(background, no timeout-kill).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from nu_scaler_tpu.ops import resample

IN_H, IN_W, OUT_H, OUT_W = 1080, 1920, 2160, 3840
N = 60


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    up = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")

    rng = np.random.default_rng(0)
    # distinct host frames (defeat any caching), C-contiguous u8
    frames = [
        np.ascontiguousarray(rng.integers(0, 256, (IN_H, IN_W, 4), np.uint8))
        for _ in range(N)
    ]
    mb = IN_H * IN_W * 4 / 1e6

    # warm-up: compile + first transfer
    jax.block_until_ready(up(jax.device_put(frames[0])))

    # 1. pipelined H2D only
    t0 = time.perf_counter()
    handles = [jax.device_put(f) for f in frames]
    jax.block_until_ready(handles)
    dt = time.perf_counter() - t0
    print(
        f"H2D pipelined: {N/dt:8.1f} frames/s  {N*mb/dt:8.0f} MB/s  ({dt*1000/N:.2f} ms/frame)",
        flush=True,
    )

    # 2. stream: H2D + upscale, results device-resident
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    outs = []
    for f in frames:
        d = jax.device_put(f)
        o = up(d)
        outs.append(o)
        if len(outs) > 2:  # double-buffer depth: let 2 frames be in flight
            outs.pop(0)
    acc = sum(jnp.sum(o[:1, :8, 0].astype(jnp.float32)) for o in outs)
    float(acc)
    dt = time.perf_counter() - t0
    print(f"stream (device-resident): {N/dt:8.1f} frames/s  ({dt*1000/N:.2f} ms/frame)", flush=True)

    # 3. stream with per-frame readback (reference dataflow)
    t0 = time.perf_counter()
    for f in frames[:20]:
        d = jax.device_put(f)
        _ = np.asarray(up(d))
    dt = time.perf_counter() - t0
    print(f"stream + per-frame D2H: {20/dt:8.1f} frames/s  ({dt*1000/20:.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
