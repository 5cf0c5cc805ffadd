"""Can the soft-warp slab extraction (pads + 2K dynamic_slices) go faster?

Measured (soft_warp_split4): pads+extraction ≈ 1.6 ms of the 2.16 ms fused
v7 warp at 1080p/k=4 — ~150 MB of traffic at an effective ~55 GB/s, way
under HBM speed. Hypothesis: the u8 lane-minor lowering is the problem;
bitcasting the padded frame to int32 (RGBA packed, 4× fewer lanes) before
the dynamic_slices should copy the same bytes through wider elements.

Run on the TPU, background, uninterrupted.
"""

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
    from nu_scaler_tpu.utils.tracing import device_timer

    h, w = 1080, 1920
    th, tw = I.WARP_TILE
    k = I.SOFT_WARP_K
    rng_px = I.WARP_RANGE
    ty, tx = h // th, w // tw
    cy, cx = ty + 1, tx + 1
    hh, hw = th // 2, tw // 2
    pad_y = rng_px + hh + 2
    pad_x = rng_px + hw + 2
    LANES = 4
    cs = (cx * tw + 32) * LANES
    rs = cy * th + 16
    bot_y = 2 + 2 * rng_px + rs - pad_y - h
    rgt_x = 2 + 2 * rng_px + cs // LANES - pad_x - w

    img = generate_test_pattern(w, h)
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    log(f"device {jax.devices()[0]}  rs={rs} cs={cs} k={k}")

    # fixed plausible candidates (values match a 16px pan; dtype int32)
    cand_y = jnp.asarray([0, 1, -1, 2], jnp.int32)[:k]
    cand_x = jnp.asarray([16, 15, 17, 14], jnp.int32)[:k]

    def live(stage_fn):
        def body(state):
            fa, fb = state
            out = stage_fn(fa, fb)
            pert = jnp.max(out[0].reshape(-1)[:8]).astype(jnp.int32) % 2
            return fb, jnp.clip(fa.astype(jnp.int32) + pert, 0, 255).astype(jnp.uint8)

        return body

    def extract_u8(frame):
        padded = jnp.pad(
            frame, ((pad_y, bot_y), (pad_x, rgt_x), (0, 0)), mode="edge"
        ).reshape(h + pad_y + bot_y, -1)
        slabs = [
            jax.lax.dynamic_slice(
                padded,
                (pad_y - hh + cand_y[i], (pad_x - hw + cand_x[i]) * LANES),
                (rs, cs),
            )
            for i in range(k)
        ]
        return jnp.stack(slabs)

    def extract_i32(frame):
        padded = jnp.pad(
            frame, ((pad_y, bot_y), (pad_x, rgt_x), (0, 0)), mode="edge"
        )
        p32 = jax.lax.bitcast_convert_type(padded, jnp.int32)  # [R, C]
        slabs = [
            jax.lax.dynamic_slice(
                p32,
                (pad_y - hh + cand_y[i], pad_x - hw + cand_x[i]),
                (rs, cs // LANES),
            )
            for i in range(k)
        ]
        st = jnp.stack(slabs)  # [k, rs, cs/4] i32
        return jax.lax.bitcast_convert_type(st, jnp.uint8).reshape(k, rs, cs)

    def extract_i32_padfirst(frame):
        # pad in int32 domain directly (pad op itself on 4x fewer lanes)
        f32v = jax.lax.bitcast_convert_type(frame, jnp.int32)  # [H, W]
        padded = jnp.pad(f32v, ((pad_y, bot_y), (pad_x, rgt_x)), mode="edge")
        slabs = [
            jax.lax.dynamic_slice(
                padded,
                (pad_y - hh + cand_y[i], pad_x - hw + cand_x[i]),
                (rs, cs // LANES),
            )
            for i in range(k)
        ]
        st = jnp.stack(slabs)
        return jax.lax.bitcast_convert_type(st, jnp.uint8).reshape(k, rs, cs)

    def both(fn):
        def g(fa, fb):
            return jnp.concatenate([fn(fa), fn(fb)], axis=0)

        return g

    for name, fn in (
        ("extract u8 (current)", extract_u8),
        ("extract i32 bitcast  ", extract_i32),
        ("extract i32 pad-first", extract_i32_padfirst),
    ):
        t = device_timer(live(both(fn)), (a0, b0), iters=10) * 1e3
        log(f"{name}: {t:7.3f} ms  (2 frames, {2*k} slabs)")

    # end-to-end: monkeypatch nothing — rebuild fn manually is invasive;
    # instead time the current fused warp for the delta context
    def fused(fa, fb):
        tiles = I.flow_tiles_fast(fa, fb)
        return swp.soft_warp_blend(fa, fb, None, 0.5, rng=rng_px, k=k, tiles=tiles)

    t = device_timer(live(fused), (a0, b0), iters=10) * 1e3
    log(f"fused flow+warp (current): {t:7.3f} ms")


if __name__ == "__main__":
    main()
