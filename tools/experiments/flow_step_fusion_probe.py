"""Flow-step fusion probe (r3): can the two per-step 4K upscales of the MC
pipelines ride ONE batched pallas_call, and where does the flow_soft step's
~0.75 ms of kernel-interaction overhead live?

Pieces (1080p→4K lanczos3, live-pair fori_loop, slope-timed):
  a. current flow_soft bench step      (expect ~4.23 ms, TODO.md)
  b. flow_soft step, batched [2] pair upscale (stack(mid, cur) → one call)
  c. flow_soft step, CONSTANT tiles + separate upscales (no flow stage —
     isolates flow↔warp interaction from warp↔upscale interaction)
  d. flow_soft step, constant tiles + batched pair upscale
  e. soft3x step (2 mids + cur), current 3 separate upscales
  f. soft3x step, batched [3] upscale
  g. hs-flow (full-res exact path) step, batched pair upscale

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
    from nu_scaler_tpu.kernels.soft_warp_pallas import soft_warp_blend
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.utils.tracing import device_timer

    h, w = 1080, 1920
    oh, ow = 2160, 3840
    img = generate_test_pattern(w, h)
    img[480:600, 640:760, :3] = 255
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    acc0 = jnp.zeros((), jnp.float32)
    log(f"device {jax.devices()[0]}")

    up = resample.make_resampler(h, w, oh, ow, "lanczos3")

    def run(name, body, state):
        t = device_timer(body, state, iters=10) * 1e3
        log(f"{name:44s}: {t:7.3f} ms/step")
        return t

    # --- a. current flow_soft step (two separate upscales)
    def body_a(state):
        prev, cur, acc = state
        mid = I.soft_interp_fast(prev, cur, 0.5)
        out_mid = up(mid)
        out_cur = up(cur)
        nxt = out_cur[:h, :w, :]
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    run("a. flow_soft, separate upscales", body_a, (a0, b0, acc0))

    # --- b. flow_soft step, batched pair upscale
    def body_b(state):
        prev, cur, acc = state
        mid = I.soft_interp_fast(prev, cur, 0.5)
        both = up(jnp.stack([mid, cur]))
        nxt = both[1, :h, :w, :]
        acc = acc + jnp.sum(both[0, :1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    run("b. flow_soft, batched [2] upscale", body_b, (a0, b0, acc0))

    # --- c. constant tiles (no flow stage), separate upscales
    tiles0 = jnp.zeros((h // I.WARP_TILE[0], w // I.WARP_TILE[1], 2), jnp.float32)

    def body_c(state):
        prev, cur, acc = state
        mid = soft_warp_blend(
            prev, cur, None, 0.5, rng=I.WARP_RANGE, k=I.SOFT_WARP_K, tiles=tiles0
        )
        out_mid = up(mid)
        out_cur = up(cur)
        nxt = out_cur[:h, :w, :]
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    run("c. const-tiles warp, separate upscales", body_c, (a0, b0, acc0))

    # --- d. constant tiles + batched pair upscale
    def body_d(state):
        prev, cur, acc = state
        mid = soft_warp_blend(
            prev, cur, None, 0.5, rng=I.WARP_RANGE, k=I.SOFT_WARP_K, tiles=tiles0
        )
        both = up(jnp.stack([mid, cur]))
        nxt = both[1, :h, :w, :]
        acc = acc + jnp.sum(both[0, :1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    run("d. const-tiles warp, batched [2] upscale", body_d, (a0, b0, acc0))

    # --- e/f. soft3x: one motion solve, mids at 1/3, 2/3 + cur
    def body_e(state):
        prev, cur, acc = state
        mids = I.soft_interp_multi(prev, cur, (1.0 / 3.0, 2.0 / 3.0))
        o1, o2, oc = up(mids[0]), up(mids[1]), up(cur)
        nxt = oc[:h, :w, :]
        acc = acc + jnp.sum(o1[:1, :8, 0].astype(jnp.float32))
        acc = acc + jnp.sum(o2[:1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    run("e. soft3x, 3 separate upscales", body_e, (a0, b0, acc0))

    def body_f(state):
        prev, cur, acc = state
        mids = I.soft_interp_multi(prev, cur, (1.0 / 3.0, 2.0 / 3.0))
        stack = jnp.concatenate([mids, cur[None]], axis=0)
        outs = up(stack)
        nxt = outs[2, :h, :w, :]
        acc = acc + jnp.sum(outs[0, :1, :8, 0].astype(jnp.float32))
        acc = acc + jnp.sum(outs[1, :1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    run("f. soft3x, batched [3] upscale", body_f, (a0, b0, acc0))

    # --- g. hs-flow exact path, batched pair upscale
    def body_g(state):
        prev, cur, acc = state
        flow = I.compute_flow_fast(prev, cur)
        mid = I.warp_blend_fast(prev, cur, flow, 0.5)
        both = up(jnp.stack([mid, cur]))
        nxt = both[1, :h, :w, :]
        acc = acc + jnp.sum(both[0, :1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    run("g. hs-flow, batched [2] upscale", body_g, (a0, b0, acc0))

    # --- h. hs-flow current (separate) for same-run comparison
    def body_h(state):
        prev, cur, acc = state
        flow = I.compute_flow_fast(prev, cur)
        mid = I.warp_blend_fast(prev, cur, flow, 0.5)
        out_mid = up(mid)
        out_cur = up(cur)
        nxt = out_cur[:h, :w, :]
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    run("h. hs-flow, separate upscales", body_h, (a0, b0, acc0))


if __name__ == "__main__":
    main()
