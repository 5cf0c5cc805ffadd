"""Prefix-ladder decomposition of the PRODUCTION flow_soft step (both
frames + flow varying, like bench.py's pipeline): time cumulative prefixes
under one identical feedback chain so stage costs = successive deltas.

Stages: flow → tile means/candidates (both frames) → slab stacks → activity
flags → pallas kernel → (alt: XLA soft warp from the same selection).

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
    from nu_scaler_tpu.kernels import soft_warp_pallas as SW
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    h, w = 1080, 1920
    th, tw, rng, k = 8, 128, 48, 8
    ty, tx = h // th, w // tw
    hh, hw = th // 2, tw // 2
    pad_y = rng + hh + 2
    pad_x = rng + hw + 2
    rs = (ty + 1) * th + 16
    cs = ((tx + 1) * tw + 32) * 4

    img = generate_test_pattern(w, h)
    prev0 = jnp.asarray(img)
    cur0 = jnp.asarray(np.roll(img, 16, axis=1))

    def sel(flow, sign):
        tiles = jnp.clip(SW._tile_mean(sign * flow, th, tw), -rng, rng)
        cand_y, cand_x, assign = SW._candidates(tiles, k, rng)
        return tiles, cand_y, cand_x, assign

    def slabs_of(frame, cand_y, cand_x):
        padded = jnp.pad(
            frame,
            ((pad_y, pad_y + th + 16), (pad_x, pad_x + tw + 32), (0, 0)),
            mode="edge",
        ).reshape(h + 2 * pad_y + th + 16, -1)
        return jnp.stack([
            jax.lax.dynamic_slice(
                padded,
                (pad_y - hh + cand_y[i], (pad_x - hw + cand_x[i]) * 4),
                (rs, cs),
            )
            for i in range(k)
        ])

    def stage(p, c, upto):
        t = 0.5
        flow = I.compute_flow_fast(p, c)
        if upto == 0:
            return flow
        sa = sel(flow, -t)
        sb = sel(flow, 1.0 - t)
        if upto == 1:
            # consume every selection output fully (partial reads get DCE'd)
            return jnp.concatenate([
                sa[0].reshape(-1), sb[0].reshape(-1),
                sa[1].astype(jnp.float32), sa[2].astype(jnp.float32),
                sb[1].astype(jnp.float32), sb[2].astype(jnp.float32),
                sa[3].reshape(-1).astype(jnp.float32),
                sb[3].reshape(-1).astype(jnp.float32),
            ])
        st_a = slabs_of(p, sa[1], sa[2])
        st_b = slabs_of(c, sb[1], sb[2])
        if upto == 2:
            # full-reduce both stacks so the whole build materializes
            return (
                jnp.sum(st_a.astype(jnp.float32), axis=(0, 1))
                + jnp.sum(st_b.astype(jnp.float32), axis=(0, 1))
            )
        if upto == 3:
            return I.warp_blend_fast(p, c, flow, t, overlap=True)
        return I.warp_blend_fast(p, c, flow, t, overlap=True, pallas_ok=False)

    names = [
        "flow", "+selection x2", "+slab stacks x2", "FULL pallas path",
        "FULL xla path",
    ]
    prev = 0.0
    for upto, name in enumerate(names):
        fn = jax.jit(lambda p, c, u=upto: stage(p, c, u))

        def body(state, fn=fn):
            p, c, acc = state
            out = fn(p, c)
            v = jnp.sum(jnp.abs(out.reshape(-1).astype(jnp.float32) - 0.37)) % 2.0
            nc = jnp.clip(c.astype(jnp.float32) + v, 0, 255).astype(jnp.uint8)
            return (c, nc, acc + v)

        t = device_timer(
            body, (prev0, cur0, jnp.zeros((), jnp.float32)), 10, ov
        ) * 1000.0
        log(f"{upto} {name:18s}: {t:7.3f} ms  (Δ {t - prev:+6.3f})")
        prev = t


if __name__ == "__main__":
    main()
