"""TPU: box-first half-res flow (flow_tiles_fast v2) + final k=4 step.

Prior points: flow tiles (gauss L0) 0.671 ms; bench step v7 k=4 refine=8:
4.521 ms / 442.4 out-fps.

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

    def live_pair(stage_fn):
        def body(state):
            fa, fb = state
            out = stage_fn(fa, fb)
            pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.int32)
            return fb, jnp.clip(
                fb.astype(jnp.int32) + pert % 2, 0, 255
            ).astype(jnp.uint8)

        return body

    t = device_timer(
        live_pair(lambda fa, fb: I.flow_tiles_fast(fa, fb)), (a0, b0), iters=10
    ) * 1e3
    log(f"flow tiles box-first         : {t:7.3f} ms   [gauss-L0: 0.671]")

    t = device_timer(
        live_pair(lambda fa, fb: I.soft_interp_fast(fa, fb, 0.5)),
        (a0, b0), iters=10,
    ) * 1e3
    log(f"soft_interp_fast (k=4, box)  : {t:7.3f} ms")

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
    log(f"bench flow_soft step (final) : {spf*1e3:7.3f} ms → {2.0/spf:6.1f} out-fps  [prior: 4.521 / 442.4]")


if __name__ == "__main__":
    main()
