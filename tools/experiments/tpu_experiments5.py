"""TPU experiment batch 5: hs-flow step decomposition with real data deps."""

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

    img = generate_test_pattern(1920, 1080)  # [H, W, 4] u8
    b_u8 = jnp.asarray(np.roll(img, 8, axis=1))
    a_u8 = jnp.asarray(img)

    def chain(u8, val):
        """Derive next u8 frame from a traced scalar so the loop can't fold."""
        return jnp.clip(u8.astype(jnp.float32) + val * 1e-6, 0, 255).astype(jnp.uint8)

    def flow_only(s):
        fl = I.compute_flow_fast(s, b_u8)
        return chain(s, fl.mean())

    t = device_timer(flow_only, a_u8, 5, ov)
    log(f"compute_flow_fast full-res: {t*1000:.2f} ms")

    def flow_base1(s):
        fl = I.compute_flow_fast(s, b_u8, base_level=1)
        return chain(s, fl.mean())

    t = device_timer(flow_base1, a_u8, 5, ov)
    log(f"compute_flow_fast base_level=1: {t*1000:.2f} ms")

    def warp_only(s):
        gy = jax.lax.broadcasted_iota(jnp.float32, (1080, 1920), 0) * 1e-3
        fl = jnp.stack([gy * 3.0 + s[0, 0, 0].astype(jnp.float32) * 1e-4, gy], -1)
        out = I.warp_blend_fast(s, b_u8, fl, 0.5)
        return chain(s, out[0, 0, 0].astype(jnp.float32))

    t = device_timer(warp_only, a_u8, 5, ov)
    log(f"warp_blend_fast (u8 HWC in/out): {t*1000:.2f} ms")

    def full_mid(s):
        fl = I.compute_flow_fast(s, b_u8)
        mid = I.warp_blend_fast(s, b_u8, fl, 0.5)
        return chain(s, mid[0, 0, 0].astype(jnp.float32))

    t = device_timer(full_mid, a_u8, 5, ov)
    log(f"flow+warp mid-frame total: {t*1000:.2f} ms")

    up = resample.make_resampler(1080, 1920, 2160, 3840, "lanczos3")

    def pair_up(s):
        out = up(jnp.stack([s, b_u8]))
        return out[1, :1080, :1920, :]

    t = device_timer(pair_up, a_u8, 10, ov)
    log(f"pair upscale [2,1080p]→4K: {t*1000:.2f} ms")

    log("DONE")


if __name__ == "__main__":
    main()
