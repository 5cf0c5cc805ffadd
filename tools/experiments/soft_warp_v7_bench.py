"""TPU timing: v7 (per-row f32 conversion pass, aligned samples) vs v5/v6.

v5 fused pan k=8: 3.416 ms, k=6: 3.192; v6 k=8: 3.306, k=6: 3.026; v6
shear k=8: 3.350; bench step v6: 5.817 ms / 343.8 out-fps.
NOTE: v7 only builds at k<=6 at 1080p (VMEM); k=8 falls back to v6.

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

    for k in (6, 4):
        t = device_timer(live_pair(fused(k)), (a0, b0), iters=10) * 1e3
        log(f"v7 fused pan   k={k}           : {t:7.3f} ms   [v6 k=6: 3.026]")

    t = device_timer(live_pair(fused(6)), (a0, bsh), iters=10) * 1e3
    log(f"v7 fused shear k=6           : {t:7.3f} ms   [v6 k=8: 3.350]")

    # warp alone at fixed tiles (kernel + extraction, no flow)
    ty, tx = h // I.WARP_TILE[0], w // I.WARP_TILE[1]
    tiles0 = jnp.full((ty, tx, 2), 1.3, jnp.float32)

    def warp_only(k):
        def body(s):
            fa, fb, tl = s
            out = soft_warp_blend(fa, fb, None, 0.5, rng=I.WARP_RANGE, k=k,
                                  tiles=tl)
            pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.float32)
            return fb, fa, tl * 0.999 + pert * 1e-9
        return body

    for k in (6, 4):
        t = device_timer(warp_only(k), (a0, b0, tiles0), iters=10) * 1e3
        log(f"v7 warp-only   k={k}           : {t:7.3f} ms")

    # full bench step at k=6 (temporarily monkeypatch soft_interp_fast's k)
    up = resample.make_resampler(h, w, 2160, 3840, "lanczos3")

    def step_k(k):
        def step(state):
            prev, cur, acc = state
            tiles = I.flow_tiles_fast(prev, cur)
            mid = soft_warp_blend(prev, cur, None, 0.5, rng=I.WARP_RANGE,
                                  k=k, tiles=tiles)
            out_mid = up(mid)
            out_cur = up(cur)
            nxt = out_cur[:h, :w, :]
            acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
            return (cur, nxt, acc)
        return step

    for k in (6, 4):
        spf = device_timer(step_k(k), (a0, b0, jnp.zeros((), jnp.float32)), iters=10)
        log(f"bench step v7 k={k}           : {spf*1e3:7.3f} ms → {2.0/spf:6.1f} out-fps  [v6 k=8: 5.817 / 343.8]")


if __name__ == "__main__":
    main()
