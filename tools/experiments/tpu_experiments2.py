"""TPU experiment batch 2: EASU stage profile, flow stage profile, ESRGAN
inference. One uninterrupted process (see tpu_experiments.py)."""

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
    from nu_scaler_tpu.ops import fsr as F
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    img = generate_test_pattern(1920, 1080)
    dimg = jax.device_put(img)
    rgb_p = jnp.asarray(img[..., :3].astype(np.float32).transpose(2, 0, 1) / 255.0)

    # EASU stages
    def taps_only(s):
        outs = [F._shift2(s, ty - 1, tx - 1) for ty in range(4) for tx in range(4)]
        return sum(outs) * (1.0 / 16.0)

    t = device_timer(taps_only, rgb_p, 10, ov)
    log(f"easu: 16 taps+sum planar: {t*1000:.2f} ms")

    def one_phase(s):
        up = F._shift2(s, -1, 0); dn = F._shift2(s, 1, 0)
        lf = F._shift2(s, 0, -1); rt = F._shift2(s, 0, 1)
        vgx = jnp.abs(up - dn).sum(axis=0) / 3.0
        vgy = jnp.abs(lf - rt).sum(axis=0) / 3.0
        norm = jnp.sqrt((vgx + 1e-4) ** 2 + (vgy + 1e-4) ** 2)
        wx = (vgx + 1e-4) / norm
        wy = 1.0 - wx
        sum_c = jnp.zeros_like(s)
        sum_w = jnp.zeros_like(wx)
        for ty in range(4):
            for tx in range(4):
                dist = jnp.abs((tx - 0.25) * wx + (ty - 0.25) * wy)
                wgt = F._fsr_cubic(dist)
                sum_c = sum_c + F._shift2(s, ty - 1, tx - 1) * wgt[None]
                sum_w = sum_w + wgt
        return sum_c / jnp.maximum(sum_w, 1e-4)[None]

    t = device_timer(one_phase, rgb_p, 5, ov)
    log(f"easu: ONE full phase: {t*1000:.2f} ms")

    def interleave(s):
        st = jnp.stack([jnp.stack([s, s], 0), jnp.stack([s, s], 0)], 0)  # [2,2,3,H,W]
        out = st.transpose(3, 0, 4, 1, 2).reshape(2160, 3840, 3)
        return s + out[:1080, :1920, :].transpose(2, 0, 1) * 1e-9

    t = device_timer(interleave, rgb_p, 5, ov)
    log(f"easu: phase interleave transpose: {t*1000:.2f} ms")

    # flow stages at full res
    lum = jnp.asarray((img[..., :3].astype(np.float32).mean(-1) / 255.0))
    flow0 = jnp.zeros((1080, 1920, 2), jnp.float32)
    t = device_timer(lambda s: I.block_warp(s[..., None], flow0)[..., 0], lum, 5, ov)
    log(f"flow: block_warp 1ch @1080p: {t*1000:.2f} ms")
    dimg2 = jax.device_put(np.roll(img, 8, axis=1))

    def full_flow(s):
        fl = I.compute_flow_fast(s, dimg2)
        return jnp.clip(s + fl[..., :1].astype(jnp.uint8) * 0, 0, 255)

    t = device_timer(full_flow, dimg, 3, ov)
    log(f"flow: compute_flow_fast full: {t*1000:.2f} ms")

    def warp_full(s):
        fl = jnp.zeros((1080, 1920, 2), jnp.float32)
        return I.warp_blend_fast(s, dimg2, fl, 0.5)

    t = device_timer(warp_full, dimg, 5, ov)
    log(f"flow: warp_blend_fast (4ch x2): {t*1000:.2f} ms")

    # ESRGAN inference 1080p→4K
    try:
        from nu_scaler_tpu.models import esrgan_lite as el

        fn = el.make_pretrained_upscaler(1080, 1920, 2160, 3840)
        t = device_timer(lambda s: fn(s)[:1080, :1920, :], dimg, 5, ov)
        log(f"esrgan-lite 1080p→4K: {t*1000:.2f} ms ({1/t:.1f} fps)")
    except Exception as e:  # noqa: BLE001
        log(f"esrgan failed: {str(e)[:200]}")

    log("DONE")


if __name__ == "__main__":
    main()
