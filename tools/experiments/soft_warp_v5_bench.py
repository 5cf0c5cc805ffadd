"""TPU timing: soft-warp strip kernel v5 (dynamic corner-index reads +
activity-gated slab DMAs) vs v4 (candidate branch ladder + whole-stack DMA).

v4 honest numbers (soft_warp_split2, 2026-08-17): kernel alone 1.94 ms,
full path cheap-flow 3.354 ms, flow+softwarp live 4.675 ms.

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
    from nu_scaler_tpu.kernels import soft_warp_pallas as SW
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.utils.tracing import device_timer

    h, w = 1080, 1920
    img = generate_test_pattern(w, h)
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    log(f"device {jax.devices()[0]}")

    def live_pair_body(stage_fn):
        def body(state):
            fa, fb = state
            out = stage_fn(fa, fb)
            pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.int32)
            return fb, jnp.clip(fb.astype(jnp.int32) + pert % 2, 0, 255).astype(jnp.uint8)

        return body

    def t_ms(stage_fn, iters=10):
        return device_timer(live_pair_body(stage_fn), (a0, b0), iters=iters) * 1e3

    flow_c = jnp.broadcast_to(jnp.asarray([15.6, 0.37], jnp.float32), (h, w, 2))

    def cheap_flow(fa):
        eps = (fa[0, 0, 0].astype(jnp.float32) % 2.0) * 1e-3
        return flow_c + eps

    # correctness on-chip first: v5 vs v4 must agree bit-near (same math)
    flow_var = np.zeros((h, w, 2), np.float32)
    flow_var[..., 0] = np.linspace(-9.3, 9.7, h)[:, None]  # shear: many cands
    flow_var[..., 1] = 2.6
    fj = jnp.asarray(flow_var)
    v5 = SW._build(h, w, 8, 128, 48, 8, strip=True, v5=True)
    v4 = SW._build(h, w, 8, 128, 48, 8, strip=True, v5=False)
    o5 = np.asarray(v5(a0, b0, fj, 0.5))
    o4 = np.asarray(v4(a0, b0, fj, 0.5))
    diff = np.abs(o5.astype(np.int32) - o4.astype(np.int32))
    log(f"v5 vs v4 on-chip: max|Δ| {diff.max()}  mean {diff.mean():.5f}")

    t = t_ms(lambda fa, fb: v5(fa, fb, cheap_flow(fa), 0.5))
    log(f"v5 full path (cheap flow)      : {t:7.3f} ms   [v4: 3.354]")

    t = t_ms(lambda fa, fb: v5(fa, fb, I.compute_flow_fast(fa, fb), 0.5))
    log(f"v5 flow + soft warp (live)     : {t:7.3f} ms   [v4: 4.675]")

    # shear flow: the adversarial case for the activity gating (many
    # candidates active per row) — v5 must not regress below v4 here
    def shear_flow(fa):
        eps = (fa[0, 0, 0].astype(jnp.float32) % 2.0) * 1e-3
        return fj + eps

    t = t_ms(lambda fa, fb: v5(fa, fb, shear_flow(fa), 0.5))
    log(f"v5 full path (shear flow)      : {t:7.3f} ms")
    t = t_ms(lambda fa, fb: v4(fa, fb, shear_flow(fa), 0.5))
    log(f"v4 full path (shear flow)      : {t:7.3f} ms")


if __name__ == "__main__":
    main()
