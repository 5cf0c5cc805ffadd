"""Anatomy of the flow_soft_ref in-context overhead: the refinement net
alone times 2.44 ms but adds 6.58 ms to the live step (soft warp + pair
upscale). Piecewise build-up of the step program to find where the extra
~4.1 ms lives — warp→refine boundary, refine→upscale boundary, or layout
choices in the combined program.

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
    assert ref is not None
    up = resample.make_resampler(h, w, 2160, 3840, "lanczos3")

    def carry(mid, cur, acc):
        # shape-preserving live-step carry: derive next state from outputs
        pert = jnp.max(mid.reshape(-1)[:8]).astype(jnp.int32) % 2
        nxt = jnp.clip(cur.astype(jnp.int32) + pert, 0, 255).astype(jnp.uint8)
        return (cur, nxt, acc)

    state0 = (a0, b0, jnp.zeros((), jnp.float32))

    def t_of(body, label, iters=10):
        t = device_timer(body, state0, iters=iters) * 1e3
        log(f"{label:42s}: {t:7.3f} ms")
        return t

    # 1. warp only (no upscale)
    def warp_only(state):
        prev, cur, acc = state
        mid = I.soft_interp_fast(prev, cur, 0.5)
        acc = acc + jnp.sum(mid[:1, :8, 0].astype(jnp.float32))
        return carry(mid, cur, acc)

    t_of(warp_only, "warp only")

    # 2. warp + refine (no upscale)
    def warp_ref(state):
        prev, cur, acc = state
        mid = ref(prev, cur, I.soft_interp_fast(prev, cur, 0.5))
        acc = acc + jnp.sum(mid[:1, :8, 0].astype(jnp.float32))
        return carry(mid, cur, acc)

    t_of(warp_ref, "warp + refine")

    # 3. refine only (const mid = prev)
    def ref_only(state):
        prev, cur, acc = state
        mid = ref(prev, cur, prev)
        acc = acc + jnp.sum(mid[:1, :8, 0].astype(jnp.float32))
        return carry(mid, cur, acc)

    t_of(ref_only, "refine only")

    # 4. refine + up(mid) (no warp, single upscale)
    def ref_up(state):
        prev, cur, acc = state
        mid = ref(prev, cur, prev)
        out_mid = up(mid)
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return carry(mid, cur, acc)

    t_of(ref_up, "refine + up(mid)")

    # 5. warp + refine + up(mid) (single upscale)
    def warp_ref_up(state):
        prev, cur, acc = state
        mid = ref(prev, cur, I.soft_interp_fast(prev, cur, 0.5))
        out_mid = up(mid)
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return carry(mid, cur, acc)

    t_of(warp_ref_up, "warp + refine + up(mid)")

    # 6. warp + refine + up(mid) + up(cur)  == the full bench step
    def full(state):
        prev, cur, acc = state
        mid = ref(prev, cur, I.soft_interp_fast(prev, cur, 0.5))
        out_mid = up(mid)
        out_cur = up(cur)
        nxt = out_cur[:h, :w, :]
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    t_of(full, "FULL (warp+refine+2 upscales)")

    # 7. reference: flow_soft full step (warp + 2 upscales)
    def full_soft(state):
        prev, cur, acc = state
        mid = I.soft_interp_fast(prev, cur, 0.5)
        out_mid = up(mid)
        out_cur = up(cur)
        nxt = out_cur[:h, :w, :]
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    t_of(full_soft, "flow_soft full (warp+2 upscales)")


if __name__ == "__main__":
    main()
