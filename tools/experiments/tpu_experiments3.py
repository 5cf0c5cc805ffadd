"""TPU experiment batch 3: ESRGAN variants inference speed, warp cost
breakdown, slab-alignment probe. One uninterrupted process."""

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
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    img = generate_test_pattern(1920, 1080)
    dimg = jax.device_put(img)

    # ESRGAN variants
    from nu_scaler_tpu.models import esrgan_lite as el
    from nu_scaler_tpu.models.train import load_checkpoint

    for arch, build in (
        ("lite-bf16", lambda: el.make_pretrained_upscaler(1080, 1920, 2160, 3840)),
    ):
        try:
            fn = build()
            t = device_timer(lambda s, fn=fn: fn(s)[:1080, :1920, :], dimg, 5, ov)
            log(f"esrgan[{arch}] 1080p→4K: {t*1000:.2f} ms ({1/t:.1f} fps)")
        except Exception as e:  # noqa: BLE001
            log(f"esrgan[{arch}] failed: {str(e)[:150]}")

    # explicit tpu-arch (may be shadowed by preference order)
    try:
        params, _ = load_checkpoint(1, "tpu")
        model = el.ESRGANLiteTPU(upscale=2)
        p16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

        @jax.jit
        def tfn(u8):
            f = u8.astype(jnp.float32) * (1.0 / 255.0)
            out = model.apply(p16, f[None, ..., :3].astype(jnp.bfloat16))[0]
            return jnp.clip(out.astype(jnp.float32) * 255.0, 0, 255).astype(jnp.uint8)

        t = device_timer(lambda s: s + 0 * tfn(s)[:1080, :1920, :3].max(), dimg, 5, ov)
        log(f"esrgan[tpu-bf16] 1080p→4K: {t*1000:.2f} ms ({1/t:.1f} fps)")
    except Exception as e:  # noqa: BLE001
        log(f"esrgan[tpu] failed: {str(e)[:300]}")

    # warp breakdown at full res
    flow0 = jnp.zeros((1080, 1920, 2), jnp.float32)
    a_p = jnp.asarray(img.astype(np.float32).transpose(2, 0, 1))

    def slices_only(s):
        pad = I.WARP_RANGE + 2
        padded = jnp.pad(s, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
        acc = s * 0
        for i in range(I.WARP_K):
            sl = jax.lax.dynamic_slice(padded, (0, pad + i, pad + i), (4, 1081, 1921))
            acc = acc + sl[:, :1080, :1920]
        return acc * (1.0 / I.WARP_K)

    t = device_timer(slices_only, a_p, 5, ov)
    log(f"warp: 8 dynamic_slices+sum planar: {t*1000:.2f} ms")

    t = device_timer(lambda s: I.block_warp_planar(s, flow0), a_p, 5, ov)
    log(f"warp: full block_warp_planar 4ch: {t*1000:.2f} ms")

    log("DONE")


if __name__ == "__main__":
    main()
