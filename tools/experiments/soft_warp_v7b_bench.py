"""TPU: (a) does v7 fit at k=8 (14.0 MB estimate vs the 12 MB build cap)?
(b) bench step at k=4 (crashed on a transient remote-compile error last
run; k=6 measured 4.898 ms / 408.4). (c) flow refine_iters ladder.

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
    from nu_scaler_tpu.kernels import soft_warp_pallas as swp
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.utils.tracing import device_timer

    h, w = 1080, 1920
    img = generate_test_pattern(w, h)
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    log(f"device {jax.devices()[0]}")

    def live_pair(stage_fn):
        def body(state):
            fa, fb = state
            out = stage_fn(fa, fb)
            pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.int32)
            return fb, jnp.clip(
                fb.astype(jnp.int32) + pert % 2, 0, 255
            ).astype(jnp.uint8)

        return body

    # (c) flow ladder first (cheap compiles)
    for refine in (8, 4, 2):
        def tiles_fn(fa, fb, refine=refine):
            th, tw = I.WARP_TILE
            half = I.compute_flow_fast(
                fa, fb, base_level=1, upsample=False, refine_iters=refine
            )
            return I._tile_mean(half, th // 2, tw // 2) * 2.0

        t = device_timer(live_pair(tiles_fn), (a0, b0), iters=10) * 1e3
        log(f"flow tiles refine={refine}        : {t:7.3f} ms   [refine=8: 0.648]")

    # (b) bench step k=4 retry
    up = resample.make_resampler(h, w, 2160, 3840, "lanczos3")

    def step_k(k, refine=8):
        def step(state):
            prev, cur, acc = state
            th, tw = I.WARP_TILE
            half = I.compute_flow_fast(
                prev, cur, base_level=1, upsample=False, refine_iters=refine
            )
            tiles = I._tile_mean(half, th // 2, tw // 2) * 2.0
            mid = swp.soft_warp_blend(prev, cur, None, 0.5, rng=I.WARP_RANGE,
                                      k=k, tiles=tiles)
            out_mid = up(mid)
            out_cur = up(cur)
            nxt = out_cur[:h, :w, :]
            acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
            return (cur, nxt, acc)
        return step

    for k, refine in ((4, 8), (4, 4), (6, 4)):
        spf = device_timer(
            step_k(k, refine), (a0, b0, jnp.zeros((), jnp.float32)), iters=10
        )
        log(f"bench step v7 k={k} refine={refine} : {spf*1e3:7.3f} ms → {2.0/spf:6.1f} out-fps")

    # (a) v7 at k=8: bypass the cap by calling the builder's v7 branch via a
    # monkeypatched threshold
    import nu_scaler_tpu.kernels.soft_warp_pallas as mod
    src_build = mod._build
    try:
        mod._build.cache_clear()
        import unittest.mock as um

        real_int = int
        # crude: temporarily swap the 12 MB cap by editing the closure is
        # not possible; instead re-evaluate fit manually and call pallas
        # path through _build with k=7 (13 MB, under cap) as a proxy
        def fused(k):
            def f(fa, fb):
                tiles = I.flow_tiles_fast(fa, fb)
                return swp.soft_warp_blend(fa, fb, None, 0.5,
                                           rng=I.WARP_RANGE, k=k, tiles=tiles)
            return f

        t = device_timer(live_pair(fused(7)), (a0, b0), iters=10) * 1e3
        log(f"v7 fused pan   k=7           : {t:7.3f} ms   [k=6: 2.566]")
    except Exception as e:  # noqa: BLE001
        log(f"k=7 probe failed: {type(e).__name__}: {e}")
    finally:
        mod._build = src_build


if __name__ == "__main__":
    main()
