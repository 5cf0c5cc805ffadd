"""TPU stage anatomy of the v7 k=4 warp (warp-only 1.471 ms): pads,
slab extraction, candidate selection, kernel — plus pad-construction
variants. Run on the TPU, background, uninterrupted."""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


H, W = 1080, 1920
K = 4
TH, TW = 8, 128
RNG = 48
LANES = 4


def main() -> None:
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.kernels import soft_warp_pallas as swp
    from nu_scaler_tpu.utils.tracing import device_timer

    ty, tx = H // TH, W // TW
    cy, cx = ty + 1, tx + 1
    hh, hw = TH // 2, TW // 2
    pad_y = RNG + hh + 2
    pad_x = RNG + hw + 2
    rs = cy * TH + 16
    cs = (cx * TW + 32) * LANES
    bot_y = 2 + 2 * RNG + rs - pad_y - H
    rgt_x = 2 + 2 * RNG + cs // LANES - pad_x - W

    img = generate_test_pattern(W, H)
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    log(f"device {jax.devices()[0]}  rs={rs} cs={cs}")

    def pad_edge(frame):
        return jnp.pad(
            frame, ((pad_y, bot_y), (pad_x, rgt_x), (0, 0)), mode="edge"
        ).reshape(H + pad_y + bot_y, -1)

    def chain(x, out):
        # feed a scalar of out back into x to keep the loop live
        pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.int32)
        return jnp.clip(x.astype(jnp.int32) + pert % 2, 0, 255).astype(jnp.uint8)

    # 1. pads only (both frames)
    def pads_body(s):
        fa, fb = s
        pa, pb = pad_edge(fa), pad_edge(fb)
        return chain(fa, pa), chain(fb, pb)

    t = device_timer(pads_body, (a0, b0), iters=10) * 1e3
    log(f"pads x2 (edge mode)          : {t:7.3f} ms")

    # 1b. pads via concat of broadcast edge strips
    def pad_concat(frame):
        top = jnp.broadcast_to(frame[:1], (pad_y, W, 4))
        bot = jnp.broadcast_to(frame[-1:], (bot_y, W, 4))
        v = jnp.concatenate([top, frame, bot], axis=0)
        left = jnp.broadcast_to(v[:, :1], (v.shape[0], pad_x, 4))
        right = jnp.broadcast_to(v[:, -1:], (v.shape[0], rgt_x, 4))
        return jnp.concatenate([left, v, right], axis=1).reshape(
            H + pad_y + bot_y, -1
        )

    def pads2_body(s):
        fa, fb = s
        pa, pb = pad_concat(fa), pad_concat(fb)
        return chain(fa, pa), chain(fb, pb)

    t = device_timer(pads2_body, (a0, b0), iters=10) * 1e3
    log(f"pads x2 (concat broadcast)   : {t:7.3f} ms")

    # 2. extraction only (pre-padded input, moving offsets)
    pa0 = pad_edge(a0)
    pb0 = pad_edge(b0)

    def extract(padded, cand_y, cand_x):
        return jnp.stack([
            jax.lax.dynamic_slice(
                padded,
                (pad_y - hh + cand_y[i], (pad_x - hw + cand_x[i]) * LANES),
                (rs, cs),
            )
            for i in range(K)
        ])

    cy0 = jnp.asarray([0, 5, -7, 12], jnp.int32)
    cx0 = jnp.asarray([16, -3, 9, -21], jnp.int32)

    def extr_body(s):
        pa, pb, cyv, cxv = s
        st_a = extract(pa, cyv, cxv)
        st_b = extract(pb, -cyv, -cxv)
        pert = (st_a[0, 0, 0].astype(jnp.int32) + st_b[0, 0, 0].astype(jnp.int32)) % 3 - 1
        return pa, pb, jnp.clip(cyv + pert, -RNG, RNG), jnp.clip(cxv + pert, -RNG, RNG)

    t = device_timer(extr_body, (pa0, pb0, cy0, cx0), iters=10) * 1e3
    log(f"extraction x2 (K={K})         : {t:7.3f} ms")

    # 2b. extraction with x snapped to 32px (128-lane aligned starts)
    def extract_al(padded, cand_y, cand_x):
        return jnp.stack([
            jax.lax.dynamic_slice(
                padded,
                (pad_y - hh + cand_y[i],
                 ((pad_x - hw + cand_x[i] * 32) // 32) * 32 * LANES),
                (rs, cs),
            )
            for i in range(K)
        ])

    def extr_al_body(s):
        pa, pb, cyv, cxv = s
        st_a = extract_al(pa, cyv, cxv)
        st_b = extract_al(pb, -cyv, -cxv)
        pert = (st_a[0, 0, 0].astype(jnp.int32) + st_b[0, 0, 0].astype(jnp.int32)) % 3 - 1
        return pa, pb, jnp.clip(cyv + pert, -1, 1), jnp.clip(cxv + pert, -1, 1)

    t = device_timer(extr_al_body, (pa0, pb0, cy0, jnp.asarray([0, 1, -1, 0], jnp.int32)), iters=10) * 1e3
    log(f"extraction x2 lane-ALIGNED x : {t:7.3f} ms")

    # 3. kernel-only: full soft_warp_blend minus (pads+extraction+cands),
    # derived as fused-warp-only minus the above pieces; direct number:
    ty_, tx_ = ty, tx
    tiles0 = jnp.full((ty_, tx_, 2), 1.3, jnp.float32)

    def warp_body(s):
        fa, fb, tl = s
        out = swp.soft_warp_blend(fa, fb, None, 0.5, rng=RNG, k=K, tiles=tl)
        pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.float32)
        return fb, fa, tl * 0.999 + pert * 1e-9

    t = device_timer(warp_body, (a0, b0, tiles0), iters=10) * 1e3
    log(f"warp-only (pads+extr+kern)   : {t:7.3f} ms   [prior: 1.471]")


if __name__ == "__main__":
    main()
