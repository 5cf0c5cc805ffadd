"""TPU experiment batch 6: hs-flow 8.65 ms/step residue hunt (post 2D
pyramids + fused-Pallas upscales). One uninterrupted process."""

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
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    img = generate_test_pattern(1920, 1080)
    b_u8 = jnp.asarray(np.roll(img, 8, axis=1))
    a_u8 = jnp.asarray(img)

    def chain(u8, val):
        return jnp.clip(u8.astype(jnp.float32) + val * 1e-6, 0, 255).astype(jnp.uint8)

    def flow_only(s):
        fl = I.compute_flow_fast(s, b_u8)
        return chain(s, fl.mean())

    t = device_timer(flow_only, a_u8, 5, ov)
    log(f"compute_flow_fast (2D pyramids): {t*1000:.2f} ms")

    def pyr_only(s):
        pyr = I.build_luma_pyramid(s, 4)
        return chain(s, pyr[-1].mean())

    t = device_timer(pyr_only, a_u8, 10, ov)
    log(f"build_luma_pyramid x1: {t*1000:.2f} ms")

    def warp_only(s):
        gy = jax.lax.broadcasted_iota(jnp.float32, (1080, 1920), 0) * 1e-3
        fl = jnp.stack([gy * 3.0 + s[0, 0, 0].astype(jnp.float32) * 1e-4, gy], -1)
        out = I.warp_blend_fast(s, b_u8, fl, 0.5)
        return chain(s, out[0, 0, 0].astype(jnp.float32))

    t = device_timer(warp_only, a_u8, 5, ov)
    log(f"warp_blend_fast: {t*1000:.2f} ms")

    up = resample.make_resampler(1080, 1920, 2160, 3840, "lanczos3")

    def up1(s):
        return up(s)[:1080, :1920, :]

    t = device_timer(up1, a_u8, 20, ov)
    log(f"fused upscale x1: {t*1000:.2f} ms")

    # refine-level costs: coarse HS on each level size
    for hh, ww, iters in ((135, 240, 32), (270, 480, 8), (540, 960, 8), (1080, 1920, 8)):
        lum = jnp.asarray(np.random.rand(hh, ww).astype(np.float32))

        def hs_lvl(s, lum2=lum, iters=iters):
            f0 = jnp.zeros((s.shape[0], s.shape[1], 2), jnp.float32)
            fl = I.horn_schunck(s, s * 0.99, f0, iters)
            return s + fl.mean() * 1e-6

        t = device_timer(hs_lvl, lum, 10, ov)
        log(f"HS {iters:2d} iters @{hh}x{ww}: {t*1000:.2f} ms")

    # block_warp at refine levels (1ch)
    for hh, ww in ((270, 480), (540, 960), (1080, 1920)):
        lum = jnp.asarray(np.random.rand(1, hh, ww).astype(np.float32))

        def bw(s, hh=hh, ww=ww):
            gy = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 0) * 1e-3
            fl = jnp.stack([gy + s[0, 0, 0] * 1e-4, gy], -1)
            return I.block_warp_planar(s, fl) * 0.999 + s * 0.001

        t = device_timer(bw, lum, 5, ov)
        log(f"block_warp 1ch @{hh}x{ww}: {t*1000:.2f} ms")

    log("DONE")


if __name__ == "__main__":
    main()
