"""Chain-dependency tax probe (r4): how much of every bench number is the
HARNESS's crop feedback, not the serving graph?

bench.py's chained loops create the step data dependency as
``next = out[:1080, :1920, :]`` — a u8 row slice at non-32 granule
(1080 % 32 != 0; u8 tiles are (32, 128), CLAUDE.md) of the materialized 4K
output, i.e. a relayout charged to EVERY step of EVERY tier. surgery7's
scalar chain (sum over out[:64]) sits at the other extreme: XLA can slice
through the free-reshape d2s and maybe elide work, UNDERSTATING.

The honest middle: force the FULL output with a cheap reduction
(sum(out)), then perturb the resident input by the resulting scalar —
no relayout, no elision.

Arms (1080p→4K, slope-timed):
  for each of {lanczos3 resampler, tpu4-int8, tpu4b2-int8, flow_soft step}:
    a. scalar64 chain   (surgery7-style lower bound, elision-prone)
    b. fullsum chain    (honest: full output forced, no relayout)
    c. crop chain       (bench.py today)
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


IN_H, IN_W, OUT_H, OUT_W = 1080, 1920, 2160, 3840


def main() -> None:
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.models import esrgan_lite as el
    from nu_scaler_tpu.models.train import load_act_scales, load_checkpoint
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    img = generate_test_pattern(IN_W, IN_H)
    img[480:600, 640:760, :3] = 255
    x0 = jnp.asarray(img)

    def run(tag, body, state, iters=12):
        t = device_timer(body, state, iters=iters) * 1e3
        log(f"{tag:40s}: {t:7.3f} ms/step ({1e3/t:6.1f} fps)")
        return t

    def scalar64(u8, out):
        v = jnp.sum(out.reshape(-1)[:64].astype(jnp.float32)) % 2.0
        return jnp.clip(u8.astype(jnp.float32) + v, 0, 255).astype(jnp.uint8)

    def fullsum(u8, out):
        v = (jnp.sum(out.astype(jnp.int32)) % 2).astype(jnp.float32)
        return jnp.clip(u8.astype(jnp.float32) + v, 0, 255).astype(jnp.uint8)

    # ---- single-output graphs --------------------------------------------
    graphs = {}
    graphs["lanczos3"] = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W,
                                                 "lanczos3")
    for arch, blocks in (("tpu4", 3), ("tpu4b2", 2)):
        restored = load_checkpoint(1, arch)
        scales = load_act_scales(1, arch, restored[1]) if restored else None
        if restored is None or scales is None:
            continue
        model = el.ESRGANLiteTPU(upscale=2, stride=4, features=128,
                                 blocks=blocks)
        graphs[f"{arch}-int8"] = el.make_serving_fn_fused(
            model, restored[0], IN_H, IN_W, quant_scales=scales)

    for name, fn in graphs.items():
        run(f"{name} a. scalar64", lambda s, fn=fn: scalar64(s, fn(s)), x0)
        run(f"{name} b. fullsum ", lambda s, fn=fn: fullsum(s, fn(s)), x0)
        run(f"{name} c. crop    ",
            lambda s, fn=fn: fn(s)[:IN_H, :IN_W, :], x0)

    # ---- the flow_soft live step (two outputs, crop feedback today) ------
    up = graphs["lanczos3"]
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    acc0 = jnp.zeros((), jnp.float32)

    def soft_crop(state):
        prev, cur, acc = state
        mid = I.soft_interp_fast(prev, cur, 0.5)
        out_mid = up(mid)
        out_cur = up(cur)
        nxt = out_cur[:IN_H, :IN_W, :]
        acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
        return (cur, nxt, acc)

    def soft_fullsum(state):
        prev, cur, acc = state
        mid = I.soft_interp_fast(prev, cur, 0.5)
        out_mid = up(mid)
        out_cur = up(cur)
        v = (jnp.sum(out_cur.astype(jnp.int32))
             + jnp.sum(out_mid.astype(jnp.int32))) % 2
        nxt = jnp.clip(
            cur.astype(jnp.float32) + v.astype(jnp.float32), 0, 255
        ).astype(jnp.uint8)
        return (cur, nxt, acc)

    run("flow_soft step c. crop (bench today)", soft_crop, (x0, b0, acc0))
    run("flow_soft step b. fullsum           ", soft_fullsum, (x0, b0, acc0))


if __name__ == "__main__":
    main()
