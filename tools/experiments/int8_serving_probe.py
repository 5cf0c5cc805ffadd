"""Gate probe for the int8 trunk serving path on tpu4b2@latest:

  1. fps at 1080p→4K, bench.py methodology, bf16 vs int8 trunk
  2. held-out quality of the int8 integer grid (make_quant_apply twin),
     full eval + the 2-seed bench subset

Adopt int8 as the quality tier's serving path only if held-out ΔPSNR vs
lanczos3 stays ≥ +4 dB on BOTH evals and fps gains real margin over 240.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/experiments/int8_serving_probe.py
(background, no timeout-kill).
"""

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

    restored = load_checkpoint(1, "tpu4b2")
    if restored is None:
        log("no tpu4b2 checkpoint")
        return
    params, step = restored
    model = el.ESRGANLiteTPU(upscale=2, stride=4, features=128, blocks=2)

    log("calibrating activation scales (training clips, seeds 100-103)...")
    scales = el.default_trunk_scales(model, params)
    log("scales:", {k: round(v, 3) for k, v in scales.items()})

    # quality first (cheap eval crops; fail fast if the grid hurts)
    qfn = el.make_quant_apply(model, params, scales)
    full = eval_vs_lanczos3(qfn, scale=2)
    sub = eval_vs_lanczos3(qfn, scale=2, seeds=(900, 901))
    log(
        f"int8 tpu4b2@{step}: held-out Δ {full['psnr_delta_db']:+.2f} dB / "
        f"{full['ssim_delta']:+.4f} SSIM  (2-seed: {sub['psnr_delta_db']:+.2f} dB / "
        f"{sub['ssim_delta']:+.4f})"
    )

    # serving fps
    h, w = 1080, 1920
    frame = generate_test_pattern(w, h)
    frame[480:600, 640:760, :3] = 255
    for name, kw in (("bf16", {}), ("int8", dict(quant_scales=scales))):
        efn = el.make_serving_fn_fused(model, params, h, w, **kw)

        def body(state, efn=efn):
            return efn(state)[:h, :w, :]

        spf = device_timer(body, jnp.asarray(frame), iters=25)
        log(f"{name} serving: {spf*1e3:.3f} ms/frame → {1.0/spf:.1f} fps")


if __name__ == "__main__":
    main()
