"""TPU anatomy of the flow_soft bench step (5.874 ms at commit 8c87e8d):
piece timings to find the residual overhead, plus the K and base_level
ladders on the fused path.

Pieces expected: soft_interp_fast 3.41 + two 4K upscales ~1.5 → 4.9 of the
5.87 measured; where is the other ~1 ms?

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

    up = resample.make_resampler(h, w, 2160, 3840, "lanczos3")

    # --- piece 1: one 4K upscale, self-feeding (the north-star loop shape)
    def up_body(s):
        fr, acc = s
        out = up(fr)
        acc = acc + jnp.sum(out[:1, :8, 0].astype(jnp.float32))
        return jnp.clip(
            fr.astype(jnp.int32) + (acc.astype(jnp.int32) % 2), 0, 255
        ).astype(jnp.uint8), acc

    t = device_timer(up_body, (a0, jnp.zeros((), jnp.float32)), iters=10) * 1e3
    log(f"one 4K lanczos3 upscale        : {t:7.3f} ms")

    # --- piece 2: two upscales per step (mid-shaped + cur) without warp
    def up2_body(s):
        fa, fb, acc = s
        o1 = up(fa)
        o2 = up(fb)
        acc = acc + jnp.sum(o1[:1, :8, 0].astype(jnp.float32))
        nxt = o2[:h, :w, :]
        return fb, nxt, acc

    t = device_timer(up2_body, (a0, b0, jnp.zeros((), jnp.float32)), iters=10) * 1e3
    log(f"two 4K upscales + slice feed   : {t:7.3f} ms")

    # --- piece 2b: two upscales, scalar feed (no 4K slice)
    def up2s_body(s):
        fa, fb, acc = s
        o1 = up(fa)
        o2 = up(fb)
        acc = acc + jnp.sum(o1[:1, :8, 0].astype(jnp.float32))
        pert = jnp.max(o2.reshape(-1)[:8]).astype(jnp.int32)
        nxt = jnp.clip(fb.astype(jnp.int32) + pert % 2, 0, 255).astype(jnp.uint8)
        return fb, nxt, acc

    t = device_timer(up2s_body, (a0, b0, jnp.zeros((), jnp.float32)), iters=10) * 1e3
    log(f"two 4K upscales + scalar feed  : {t:7.3f} ms")

    # --- piece 3: batched [2] upscale variant (resamplers are batch-
    # polymorphic over a leading dim)
    def upb_body(s):
        fa, fb, acc = s
        both = up(jnp.stack([fa, fb]))
        acc = acc + jnp.sum(both[0, :1, :8, 0].astype(jnp.float32))
        nxt = both[1, :h, :w, :]
        return fb, nxt, acc

    try:
        t = device_timer(upb_body, (a0, b0, jnp.zeros((), jnp.float32)), iters=10) * 1e3
        log(f"batched [2] 4K upscale + slice : {t:7.3f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"batched [2] upscale failed: {type(e).__name__}: {e}")

    # --- K / base_level ladder on the fused soft path (live pair)
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

    for k in (8, 6, 4):
        t = device_timer(live_pair(fused(k)), (a0, b0), iters=10) * 1e3
        log(f"fused soft_interp k={k}         : {t:7.3f} ms")

    # quarter-res tile flow (base_level=2): tiles from (2,32) quarter tiles
    def tiles_q(fa, fb):
        qf = I.compute_flow_fast(fa, fb, base_level=2, upsample=False)
        return I._tile_mean(qf, I.WARP_TILE[0] // 4, I.WARP_TILE[1] // 4) * 4.0

    t = device_timer(live_pair(tiles_q), (a0, b0), iters=10) * 1e3
    log(f"flow tiles base_level=2        : {t:7.3f} ms   [base_level=1: 0.648]")

    def fused_q(fa, fb):
        return soft_warp_blend(a0, b0, None, 0.5, rng=I.WARP_RANGE, k=6,
                               tiles=tiles_q(fa, fb))

    t = device_timer(live_pair(fused_q), (a0, b0), iters=10) * 1e3
    log(f"fused k=6 + quarter-res flow   : {t:7.3f} ms")


if __name__ == "__main__":
    main()
