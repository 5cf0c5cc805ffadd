"""TPU measurement of the Pallas cell-grid soft warp vs the XLA soft path
(kernels/soft_warp_pallas.py; VERDICT r3 item 2 — flow_soft ≥ 450 out-fps
needs the warp stage at ~1 ms). Also checks the kernel against its numpy
golden ON THE TPU (Mosaic lowering differences would show here).

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
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    h, w = 1080, 1920
    img = generate_test_pattern(w, h)
    a = jnp.asarray(img)
    b = jnp.asarray(np.roll(img, 5, axis=1))

    # correctness on TPU vs numpy golden (small but Mosaic-compiled shape)
    hs, ws = 64, 256
    a_s = np.asarray(img[:hs, :ws])
    b_s = np.asarray(np.roll(img, 3, axis=1)[:hs, :ws])
    fl = np.zeros((hs, ws, 2), np.float32)
    fl[..., 0] = np.linspace(-4, 4, ws)[None, :] + 0.13
    fl[..., 1] = 1.37
    out_t = np.asarray(
        SW.soft_warp_blend(
            jnp.asarray(a_s), jnp.asarray(b_s), jnp.asarray(fl), 0.4,
            tile=(8, 128), rng=16,
        )
    )
    ref = SW.soft_warp_blend_ref(a_s, b_s, fl, 0.4, tile=(8, 128), rng=16)
    d = np.abs(out_t.astype(int) - ref.astype(int))
    log(f"TPU kernel vs golden (64x256): max {d.max()}, mean {d.mean():.4f}")

    # flow for the big timing
    flow = I.compute_flow_fast(a, b)
    flow.block_until_ready()

    def chain(u8, out):
        return jnp.clip(
            u8.astype(jnp.int32) + out[0, 0, 0].astype(jnp.int32) % 2, 0, 255
        ).astype(jnp.uint8)

    # Pallas soft warp alone (flow fixed)
    pall = jax.jit(lambda fa: SW.soft_warp_blend(fa, b, flow, 0.5))
    t = device_timer(lambda s: chain(s, pall(s)), a, 10, ov)
    log(f"pallas soft warp alone : {t*1000:7.3f} ms")

    xla = jax.jit(
        lambda fa: I.warp_blend_fast(fa, b, flow, 0.5, overlap=True, pallas_ok=False)
    )
    t = device_timer(lambda s: chain(s, xla(s)), a, 5, ov)
    log(f"XLA soft warp alone    : {t*1000:7.3f} ms")

    hard = jax.jit(lambda fa: I.warp_blend_fast(fa, b, flow, 0.5, overlap=False))
    t = device_timer(lambda s: chain(s, hard(s)), a, 10, ov)
    log(f"hard block warp alone  : {t*1000:7.3f} ms")

    # full flow_soft pipeline step (flow + warp), as the bench pipeline runs
    def step_soft(s):
        flw = I.compute_flow_fast(s, b)
        return chain(s, I.warp_blend_fast(s, b, flw, 0.5, overlap=True))

    t = device_timer(step_soft, a, 10, ov)
    log(f"flow_soft full step    : {t*1000:7.3f} ms → {2.0/t:6.1f} out-fps")

    # agreement with the XLA soft path at 1080p on the real flow
    o_p = np.asarray(pall(a))
    o_x = np.asarray(xla(a))
    d = np.abs(o_p[..., :3].astype(int) - o_x[..., :3].astype(int))
    log(f"pallas vs XLA soft @1080p: max {d.max()}, mean {d.mean():.3f}, "
        f">2: {(d > 2).mean()*100:.3f}%")


if __name__ == "__main__":
    main()
