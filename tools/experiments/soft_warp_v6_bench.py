"""TPU timing: v6 strip-of-4 soft warp vs v5 per-row (v5 fused path measured
3.416 ms live pair, bench step 5.874 ms / 340.5 out-fps at 8c87e8d).

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
    from nu_scaler_tpu.kernels.soft_warp_pallas import soft_warp_blend
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.utils.tracing import device_timer

    h, w = 1080, 1920
    img = generate_test_pattern(w, h)
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    log(f"device {jax.devices()[0]}")

    # shear-motion pair: per-row horizontal shift 0..24 px (worst-case
    # candidate diversity, same construction as soft_warp_v5_bench)
    sh = np.empty_like(img)
    for r in range(h):
        sh[r] = np.roll(img[r], int(r * 24 / h) + 1, axis=0)
    bsh = jnp.asarray(sh)

    def live_pair(stage_fn):
        def body(state):
            fa, fb = state
            out = stage_fn(fa, fb)
            pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.int32)
            return fb, jnp.clip(
                fb.astype(jnp.int32) + pert % 2, 0, 255
            ).astype(jnp.uint8)

        return body

    def fused(k):
        def f(fa, fb):
            tiles = I.flow_tiles_fast(fa, fb)
            return soft_warp_blend(fa, fb, None, 0.5, rng=I.WARP_RANGE,
                                   k=k, tiles=tiles)
        return f

    for k in (8, 6):
        t = device_timer(live_pair(fused(k)), (a0, b0), iters=10) * 1e3
        log(f"v6 fused pan   k={k}           : {t:7.3f} ms   [v5 k=8: 3.416, k=6: 3.192]")

    t = device_timer(live_pair(fused(8)), (a0, bsh), iters=10) * 1e3
    log(f"v6 fused shear k=8           : {t:7.3f} ms   [v5+full flow: 2.972]")

    # full bench step (mid + two 4K upscales), exactly bench.py's body
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
    log(f"bench flow_soft step (v6)    : {spf*1e3:7.3f} ms → {2.0/spf:6.1f} out-fps  [v5: 5.874 / 340.5]")


if __name__ == "__main__":
    main()
