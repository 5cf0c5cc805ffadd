"""TPU timing of the production flow_soft step with quarter-res flow
(flow_tiles_fast base_level=2 at ≥720 rows). Priors: half-res flow step
4.521 ms / 442.4 out-fps; flow tiles 0.648 ms (half) vs 0.322 (quarter).

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

    t = device_timer(
        live(lambda fa, fb: I.soft_interp_fast(fa, fb, 0.5)), (a0, b0), iters=10
    ) * 1e3
    log(f"soft_interp_fast quarter-flow: {t:7.3f} ms   [half-flow: 2.14]")

    up = resample.make_resampler(h, w, 2160, 3840, "lanczos3")

    def step(state):
        prev, cur, acc = state
        mid = I.soft_interp_fast(prev, cur, 0.5)
        out_mid = up(mid)
        out_cur = up(cur)
        nxt = out_cur[:h, :w, :]
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    spf = device_timer(step, (a0, b0, jnp.zeros((), jnp.float32)), iters=10)
    log(f"bench step quarter-flow      : {spf*1e3:7.3f} ms → {2.0/spf:6.1f} out-fps  [half: 4.521 / 442.4]")


if __name__ == "__main__":
    main()
