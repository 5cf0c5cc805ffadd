"""Why does flow_soft cost more inside bench.py's pipeline than standalone?

Standalone (soft_warp_tpu_bench.py) times warp with frame b and flow FIXED —
XLA hoists b's slab stack + both candidate top_ks out of the timing loop.
This probe carries BOTH frames through the loop like bench.py's
pipeline_body, so nothing is hoistable, and splits the cost:

  flow only | pallas warp only | xla warp only | flow+warp | full step (+2 up)

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
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    h, w = 1080, 1920
    img = generate_test_pattern(w, h)
    prev = jnp.asarray(img)
    cur = jnp.asarray(np.roll(img, 16, axis=1))

    up = resample.make_resampler(h, w, 2 * h, 2 * w, "lanczos3")

    def carry_timer(step, label, iters=10):
        t = device_timer(step, (prev, cur, jnp.zeros((), jnp.float32)), iters, ov)
        log(f"{label:26s}: {t*1000:7.3f} ms/step")
        return t

    def rot(prv, c, out, acc):
        # rotate frames so every iteration sees fresh data; fold a probe of
        # `out` into the carry so it stays live
        acc = acc + jnp.sum(out[:1, :8, 0].astype(jnp.float32))
        return (c, jnp.roll(prv, 1, axis=0), acc)

    def step_flow(carry):
        p, c, acc = carry
        flw = I.compute_flow_fast(p, c)
        return rot(p, c, flw, acc)

    carry_timer(step_flow, "flow only")

    flow_fixed = I.compute_flow_fast(prev, cur)
    flow_fixed.block_until_ready()

    def step_warp_pallas(carry):
        p, c, acc = carry
        mid = I.warp_blend_fast(p, c, flow_fixed, 0.5, overlap=True)
        return rot(p, c, mid, acc)

    carry_timer(step_warp_pallas, "pallas warp (fixed flow)")

    def step_warp_xla(carry):
        p, c, acc = carry
        mid = I.warp_blend_fast(
            p, c, flow_fixed, 0.5, overlap=True, pallas_ok=False
        )
        return rot(p, c, mid, acc)

    carry_timer(step_warp_xla, "xla warp (fixed flow)")

    def step_fw(carry):
        p, c, acc = carry
        flw = I.compute_flow_fast(p, c)
        mid = I.warp_blend_fast(p, c, flw, 0.5, overlap=True)
        return rot(p, c, mid, acc)

    carry_timer(step_fw, "flow + pallas warp")

    def step_fw_xla(carry):
        p, c, acc = carry
        flw = I.compute_flow_fast(p, c)
        mid = I.warp_blend_fast(p, c, flw, 0.5, overlap=True, pallas_ok=False)
        return rot(p, c, mid, acc)

    carry_timer(step_fw_xla, "flow + xla warp")

    def step_full(carry):
        p, c, acc = carry
        flw = I.compute_flow_fast(p, c)
        mid = I.warp_blend_fast(p, c, flw, 0.5, overlap=True)
        out_mid = up(mid)
        out_cur = up(c)
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return (c, out_cur[:h, :w, :], acc)

    carry_timer(step_full, "full step (bench shape)")

    def step_up_only(carry):
        p, c, acc = carry
        out_mid = up(p)
        out_cur = up(c)
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return (c, out_cur[:h, :w, :], acc)

    carry_timer(step_up_only, "2x upscale only")


if __name__ == "__main__":
    main()
