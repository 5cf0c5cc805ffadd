"""End-to-end A/B of the int32-domain slab extraction (production code now
does i32 pad-first; the prior u8-domain numbers are v7 k=4: fused warp
2.138-2.164 ms, bench step 4.521 ms / 442.4 out-fps).

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

    def live(stage_fn):
        def body(state):
            fa, fb = state
            out = stage_fn(fa, fb)
            pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.int32) % 2
            return fb, jnp.clip(fa.astype(jnp.int32) + pert, 0, 255).astype(
                jnp.uint8
            )

        return body

    def fused(fa, fb):
        tiles = I.flow_tiles_fast(fa, fb)
        return swp.soft_warp_blend(
            fa, fb, None, 0.5, rng=I.WARP_RANGE, k=I.SOFT_WARP_K, tiles=tiles
        )

    t = device_timer(live(fused), (a0, b0), iters=10) * 1e3
    log(f"fused flow+warp i32-extract : {t:7.3f} ms   [u8: 2.138-2.164]")

    # full bench step (flow+warp+2 upscales, slice feed — bench.py shape)
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
    log(f"bench step i32-extract      : {spf*1e3:7.3f} ms → {2.0/spf:6.1f} out-fps  [u8: 4.521 / 442.4]")

    # correctness vs the XLA soft path at 1080p (same gate as sw_bench)
    flow = I.compute_flow_fast(a0, b0)
    ref = I.warp_blend_fast(a0, b0, flow, 0.5, overlap=True)
    got = swp.soft_warp_blend(a0, b0, flow, 0.5, rng=I.WARP_RANGE, k=I.SOFT_WARP_K)
    d = jnp.abs(got.astype(jnp.int32) - ref.astype(jnp.int32))
    log(f"pallas vs XLA soft @1080p: max {jnp.max(d)}, mean {jnp.mean(d.astype(jnp.float32)):.3f}, >2: {jnp.mean((d > 2).astype(jnp.float32))*100:.3f}%")


if __name__ == "__main__":
    main()
