#!/usr/bin/env python
"""Serving-speed sweep over ESRGANLiteTPU trunk layouts (random weights).

Measures the FULL 1080p→4K u8→u8 serving path (`make_serving_fn`) per
architecture on the TPU, with the chained-fori_loop methodology (CLAUDE.md:
never trust per-call wall timing through the tunnel).

Context: tools/experiments/conv_sweep.py measured XLA 3×3-conv MXU efficiency at equal
FLOPs as 540p/C=64 = 5.2%, 270p/C=128 = 28.9%, 135p/C=256 = 56.1% — deeper
space-to-depth with wider channels is the serving lever. This sweep answers
what that means end-to-end (tail/base convs scale differently with stride).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python tools/esrgan_arch_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nu_scaler_tpu.models import esrgan_lite as el

H, W, OH, OW = 1080, 1920, 2160, 3840
FETCH_S = 0.0285


def timed_serving(fn, iters=20):
    frame = np.random.default_rng(0).integers(0, 256, (H, W, 4), np.uint8)
    x = jax.device_put(jnp.asarray(frame))

    @jax.jit
    def run(x):
        def body(i, x):
            out = fn(x)  # [OH, OW, 4] u8
            return out[:H, :W, :]  # chain: crop feeds the next step

        return jax.lax.fori_loop(0, iters, body, x)[0, 0, 0].astype(jnp.int32)

    int(run(x))  # compile + warm
    t0 = time.perf_counter()
    int(run(x))
    dt = time.perf_counter() - t0 - FETCH_S
    return dt / iters * 1000


def main():
    print("device:", jax.devices()[0], file=sys.stderr)
    configs = [
        ("tpu4+sparse", dict(stride=4, features=128, blocks=3, base_impl="sparse")),
        ("s8/C128/b3+sparse", dict(stride=8, features=128, blocks=3, base_impl="sparse")),
        ("s8/C192/b3+sparse", dict(stride=8, features=192, blocks=3, base_impl="sparse")),
        ("s8/C256/b2+sparse", dict(stride=8, features=256, blocks=2, base_impl="sparse")),
        ("s8/C256/b3+sparse", dict(stride=8, features=256, blocks=3, base_impl="sparse")),
    ]
    for name, kw in configs:
        try:
            model = el.ESRGANLiteTPU(upscale=2, **kw)
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
            fn = el.make_serving_fn(model, params, H, W, OH, OW)
            ms = timed_serving(fn)
            print(f"{name:22s}: {ms:7.3f} ms/frame  {1000.0/ms:7.1f} fps")
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
