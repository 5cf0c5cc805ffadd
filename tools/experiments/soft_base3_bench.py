"""TPU timing of the flow_soft step with EIGHTH-res flow (base_level=3)
vs the production quarter-res (base_level=2) — both the standalone
soft_interp_fast latency and the full bench step (interp + mid/cur 4K
upscales). Quality at 1080p: eighth-res −0.04 dB / −0.011 SSIM vs
quarter-res (soft_base_level_1080p.py). Priors: quarter-flow
soft_interp_fast 1.20 ms, step 4.226 ms / 473.3 out-fps.

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
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.utils.tracing import device_timer

    h, w = 1080, 1920
    img = generate_test_pattern(w, h)
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    log(f"device {jax.devices()[0]}")

    def live(stage_fn):
        def body(state):
            fa, fb = state
            out = stage_fn(fa, fb)
            pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.int32) % 2
            return fb, jnp.clip(fa.astype(jnp.int32) + pert, 0, 255).astype(
                jnp.uint8
            )

        return body

    up = resample.make_resampler(h, w, 2160, 3840, "lanczos3")

    for bl in (2, 3):
        t = device_timer(
            live(lambda fa, fb: I.soft_interp_fast(fa, fb, 0.5, flow_base_level=bl)),
            (a0, b0),
            iters=10,
        ) * 1e3
        log(f"soft_interp_fast bl={bl}: {t:7.3f} ms   [bl=2 prior: 1.20]")

        def step(state):
            prev, cur, acc = state
            mid = I.soft_interp_fast(prev, cur, 0.5, flow_base_level=bl)
            out_mid = up(mid)
            out_cur = up(cur)
            nxt = out_cur[:h, :w, :]
            acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
            return (cur, nxt, acc)

        spf = device_timer(step, (a0, b0, jnp.zeros((), jnp.float32)), iters=10)
        log(
            f"bench step bl={bl}      : {spf*1e3:7.3f} ms → {2.0/spf:6.1f} out-fps"
            "  [bl=2 prior: 4.226 / 473.3]"
        )


if __name__ == "__main__":
    main()
