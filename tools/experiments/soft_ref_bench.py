"""TPU timing of the flow_soft_ref live step: soft warp (quarter-res flow)
+ learned refinement net (interp_ref4) + pair upscale to 4K — the same
program bench.py's pipeline[hs-soft-ref] times. Priors: flow_soft step
4.226 ms / 473.3 out-fps; the refinement adds one 4-layer 24ch conv stack
at 1080p.

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
    from nu_scaler_tpu.models.interp_refine import get_refine_graph
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.utils.tracing import device_timer

    h, w = 1080, 1920
    img = generate_test_pattern(w, h)
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    log(f"device {jax.devices()[0]}")

    ref = get_refine_graph(h, w)
    assert ref is not None, "no interp_ref4 checkpoint"

    up = resample.make_resampler(h, w, 2160, 3840, "lanczos3")

    def make_step(with_ref: bool):
        def step(state):
            prev, cur, acc = state
            mid = I.soft_interp_fast(prev, cur, 0.5)
            if with_ref:
                mid = ref(prev, cur, mid)
            out_mid = up(mid)
            out_cur = up(cur)
            nxt = out_cur[:h, :w, :]
            acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
            return (cur, nxt, acc)

        return step

    state0 = (a0, b0, jnp.zeros((), jnp.float32))
    t_base = device_timer(make_step(False), state0, iters=10) * 1e3
    log(f"flow_soft step      : {t_base:7.3f} ms  ({2e3 / t_base:7.1f} out-fps)")
    t_ref = device_timer(make_step(True), state0, iters=10) * 1e3
    log(f"flow_soft_ref step  : {t_ref:7.3f} ms  ({2e3 / t_ref:7.1f} out-fps)")
    log(f"refinement share    : {t_ref - t_base:7.3f} ms")

    # the production composition: phase-domain net output feeds the banded
    # resample directly (make_refined_mid_upscaler — what bench.py times)
    mid_up = I.make_refined_mid_upscaler(h, w, 2160, 3840)

    def step_phase(state):
        prev, cur, acc = state
        out_mid = mid_up(prev, cur, 0.5)
        out_cur = up(cur)
        nxt = out_cur[:h, :w, :]
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    t_ph = device_timer(step_phase, state0, iters=10) * 1e3
    log(f"flow_soft_ref phase : {t_ph:7.3f} ms  ({2e3 / t_ph:7.1f} out-fps)")

    # standalone refinement cost (net alone, no warp/upscale context)
    def ref_only(state):
        prev, cur, acc = state
        mid = ref(prev, cur, prev)
        acc = acc + jnp.sum(mid[:1, :8, 0].astype(jnp.float32))
        return (cur, prev, acc)

    t_net = device_timer(ref_only, state0, iters=10) * 1e3
    log(f"refine net alone    : {t_net:7.3f} ms")


if __name__ == "__main__":
    main()
