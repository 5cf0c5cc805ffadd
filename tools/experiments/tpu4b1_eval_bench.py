"""Post-training gate for tpu4b1 (single residual block): held-out quality
vs lanczos3 (full eval + the bench's 2-seed subset) and fused serving fps at
1080p→4K, timed like bench.py. Serve it as the quality tier only if
ΔPSNR ≥ +4 dB held-out AND fps clears 240 with real margin.

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
    from nu_scaler_tpu.models import esrgan_lite as el
    from nu_scaler_tpu.models.data import eval_vs_lanczos3
    from nu_scaler_tpu.models.train import load_checkpoint
    from nu_scaler_tpu.utils.tracing import device_timer

    log(f"device {jax.devices()[0]}")

    for arch, kw in (
        ("tpu4b1", dict(stride=4, features=128, blocks=1)),
        ("tpu4b2", dict(stride=4, features=128, blocks=2)),
    ):
        restored = load_checkpoint(1, arch)
        if restored is None:
            log(f"{arch}: no checkpoint")
            continue
        params, step = restored
        model = el.ESRGANLiteTPU(upscale=2, **kw)

        # quality: full held-out eval + the 2-seed subset bench.py reports
        fn = jax.jit(lambda x, m=model, p=params: m.apply(p, x))
        full = eval_vs_lanczos3(fn, scale=2)
        sub = eval_vs_lanczos3(fn, scale=2, seeds=(900, 901))
        log(
            f"{arch}@{step}: held-out Δ {full['psnr_delta_db']:+.2f} dB / "
            f"{full['ssim_delta']:+.4f} SSIM  (bench 2-seed subset: "
            f"{sub['psnr_delta_db']:+.2f} dB / {sub['ssim_delta']:+.4f})"
        )

        # serving fps, bench.py methodology
        h, w = 1080, 1920
        efn = el.make_serving_fn_fused(model, params, h, w)
        frame = generate_test_pattern(w, h)
        frame[480:600, 640:760, :3] = 255

        def body(state, efn=efn):
            out = efn(state)
            return out[:h, :w, :]

        spf = device_timer(body, jnp.asarray(frame), iters=25)
        log(f"{arch}@{step}: serving {spf*1e3:.3f} ms/frame → {1.0/spf:.1f} fps")


if __name__ == "__main__":
    main()
