"""Head+base int8 on top of the adopted int8 trunk: the inputs to both are
exact u8 0..255 planes (fixed /2-rounding input grid, symmetric → both pad
semantics survive; the bilinear base uses DC-exact dequant so flat fields
and the alpha plane reproduce exactly). Measures fps + held-out quality for
tpu4 (quality tier) and tpu4b1 (performance tier).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/experiments/int8_io_probe.py
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
    from nu_scaler_tpu.models.train import load_act_scales, load_checkpoint
    from nu_scaler_tpu.utils.tracing import device_timer

    log(f"device {jax.devices()[0]}")
    h, w = 1080, 1920
    frame = generate_test_pattern(w, h)
    frame[480:600, 640:760, :3] = 255

    for arch, kw in (
        ("tpu4", dict(stride=4, features=128)),
        ("tpu4b1", dict(stride=4, features=128, blocks=1)),
    ):
        restored = load_checkpoint(1, arch)
        if restored is None:
            log(f"{arch}: no checkpoint")
            continue
        params, step = restored
        model = el.ESRGANLiteTPU(upscale=2, **kw)
        scales = load_act_scales(1, arch, step)
        sio = dict(scales, head=1.0, base=1.0)

        qfn = el.make_quant_apply(model, params, sio)
        full = eval_vs_lanczos3(qfn, scale=2)
        sub = eval_vs_lanczos3(qfn, scale=2, seeds=(900, 901))
        log(
            f"{arch}@{step} int8+io: held-out Δ {full['psnr_delta_db']:+.2f} dB / "
            f"{full['ssim_delta']:+.4f} SSIM  (2-seed: {sub['psnr_delta_db']:+.2f} "
            f"dB / {sub['ssim_delta']:+.4f})"
        )

        for name, skw in (
            ("int8-trunk", dict(quant_scales=scales)),
            ("int8+io   ", dict(quant_scales=sio)),
        ):
            efn = el.make_serving_fn_fused(model, params, h, w, **skw)

            def body(state, efn=efn):
                return efn(state)[:h, :w, :]

            spf = device_timer(body, jnp.asarray(frame), iters=25)
            log(f"{arch} {name} serving: {spf*1e3:.3f} ms/frame → {1.0/spf:.1f} fps")


if __name__ == "__main__":
    main()
