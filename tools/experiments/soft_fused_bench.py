"""TPU timing: fused flow_soft path (half-res flow → tile means → Pallas v5
soft warp) vs the r3 baseline (full-res flow + v4 kernel: 7.57 ms bench step,
264 out-fps).

Run on the TPU, background, uninterrupted."""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def main() -> None:
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.utils.tracing import device_timer

    h, w = 1080, 1920
    img = generate_test_pattern(w, h)
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    log(f"device {jax.devices()[0]}")

    def live_pair_body(stage_fn):
        def body(state):
            fa, fb = state
            out = stage_fn(fa, fb)
            pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.int32)
            return fb, jnp.clip(fb.astype(jnp.int32) + pert % 2, 0, 255).astype(jnp.uint8)

        return body

    def t_ms(stage_fn, iters=10):
        return device_timer(live_pair_body(stage_fn), (a0, b0), iters=iters) * 1e3

    t = t_ms(lambda fa, fb: I.flow_tiles_fast(fa, fb))
    log(f"flow_tiles_fast (live pair)    : {t:7.3f} ms   [full flow: 1.394]")

    t = t_ms(lambda fa, fb: I.soft_interp_fast(fa, fb, 0.5))
    log(f"soft_interp_fast (live pair)   : {t:7.3f} ms   [old flow+warp: 4.675]")

    # the full bench step (mid + two 4K upscales), exactly bench.py's body
    up = resample.make_resampler(h, w, 2160, 3840, "lanczos3")

    def step(state):
        prev, cur, acc = state
        mid = I.soft_interp_fast(prev, cur, 0.5)
        out_mid = up(mid)
        out_cur = up(cur)
        nxt = out_cur[:h, :w, :]
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    spf = device_timer(step, (a0, b0, jnp.zeros((), jnp.float32)), iters=10)
    log(f"bench flow_soft step           : {spf*1e3:7.3f} ms → {2.0/spf:6.1f} out-fps  [was 7.573 / 264]")


if __name__ == "__main__":
    main()
