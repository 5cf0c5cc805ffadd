"""TPU experiment batch 4: block-warp variants with REAL data dependencies
(flow derived from the evolving state so XLA cannot fold the loop)."""

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
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    img = generate_test_pattern(1920, 1080)
    a_p = jnp.asarray(img.astype(np.float32).transpose(2, 0, 1))

    def state_flow(s):
        """Cheap state-dependent flow field (prevents loop folding)."""
        base = s[0, :1, :1] * 1e-3  # scalar-ish from state
        gy = jax.lax.broadcasted_iota(jnp.float32, (1080, 1920), 0) * 1e-3
        return jnp.stack([gy * 3.0 + base, gy], axis=-1)

    def warp_k(k):
        def body(s):
            fl = state_flow(s)
            return I.block_warp_planar(s, fl, k=k)

        return body

    for k in (8, 4, 2):
        t = device_timer(warp_k(k), a_p, 5, ov)
        log(f"block_warp_planar k={k}: {t*1000:.2f} ms")

    # integer-only variant (no subpixel lerp): slices + select only
    def warp_int(s):
        fl = state_flow(s)
        c, h, w = s.shape
        tiles = jnp.clip(I._tile_mean(fl, 8, 128), -I.WARP_RANGE, I.WARP_RANGE)
        q = jnp.round(tiles).astype(jnp.int32)
        side = 2 * I.WARP_RANGE + 2
        ids = (q[..., 1] + I.WARP_RANGE) * side + (q[..., 0] + I.WARP_RANGE)
        hist = jnp.zeros((side * side,), jnp.int32).at[ids.reshape(-1)].add(1)
        _, top = jax.lax.top_k(hist, 8)
        cy = top // side - I.WARP_RANGE
        cx = top % side - I.WARP_RANGE
        d2 = (q[..., 1, None] - cy) ** 2 + (q[..., 0, None] - cx) ** 2
        assign = jnp.argmin(d2, axis=-1)
        assign_px = I._tile_to_pixels(assign, 8, 128, h, w)[None]
        pad = I.WARP_RANGE + 2
        padded = jnp.pad(s, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
        slabs = [
            jax.lax.dynamic_slice(padded, (0, pad + cy[i], pad + cx[i]), (c, h, w))
            for i in range(8)
        ]
        return jax.lax.select_n(jnp.broadcast_to(assign_px, (c, h, w)), *slabs)

    t = device_timer(warp_int, a_p, 5, ov)
    log(f"block_warp integer-only k=8: {t*1000:.2f} ms")

    # flow-compute alone with the same dependency scheme
    b_u8 = jnp.asarray(np.roll(img, 8, axis=1))

    def flow_only(s):
        u8 = jnp.clip(s, 0, 255).astype(jnp.uint8)
        fl = I.compute_flow_fast(u8, b_u8)
        return s + fl.mean() * 1e-6

    t = device_timer(flow_only, a_p, 5, ov)
    log(f"compute_flow_fast (dependent): {t*1000:.2f} ms")

    log("DONE")


if __name__ == "__main__":
    main()
