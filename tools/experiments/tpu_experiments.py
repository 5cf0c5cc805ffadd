"""Consolidated TPU experiment batch (run as ONE uninterrupted process —
killing a tunneled TPU client mid-operation wedges the remote worker for
~15 minutes).

Covers: layout cost probes, EASU profile, matmul-precision fidelity/speed,
Pallas banded resample validation + speed vs XLA.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def main() -> None:
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.kernels import reference as ref
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.ops.metrics import psnr
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, fetch overhead {ov*1000:.1f} ms")

    # --- 1. layout probes: where do channel-minor arrays pay? -------------
    from nu_scaler_tpu.ops.fsr import _shift2

    x_hwc = jnp.asarray(np.random.rand(1080, 1920, 3).astype(np.float32))
    x_chw = jnp.asarray(np.random.rand(3, 1080, 1920).astype(np.float32))
    t = device_timer(lambda s: _shift2(s, 1, 1) * 1.0000001, x_hwc, 10, ov)
    log(f"shift [H,W,3]: {t*1000:.3f} ms")

    def shift_chw(s):
        p = jnp.pad(s, ((0, 0), (0, 1), (0, 1)), mode="edge")
        return p[:, 1:, 1:] * 1.0000001

    t = device_timer(shift_chw, x_chw, 10, ov)
    log(f"shift [3,H,W]: {t*1000:.3f} ms")

    # --- 2. precision ladder on the banded lanczos3 -----------------------
    img = generate_test_pattern(1920, 1080)
    golden = ref.separable_resample_ref(img, 2160, 3840, "lanczos3")
    dimg = jax.device_put(img)
    for prec in ("highest", "high", "default"):
        fn = resample.make_resampler(1080, 1920, 2160, 3840, "lanczos3", prec)
        out = np.asarray(fn(dimg))
        p = psnr(out, golden)
        spf = device_timer(lambda s, fn=fn: fn(s)[:1080, :1920, :], dimg, 50, ov)
        log(f"lanczos3 banded precision={prec:8}: {1/spf:7.1f} fps  psnr {p:.1f} dB")

    # --- 3. Pallas banded resample on real Mosaic -------------------------
    try:
        from nu_scaler_tpu.kernels.resample_pallas import make_pallas_resampler

        pfn = make_pallas_resampler(1080, 1920, 2160, 3840, "lanczos3")
        out = np.asarray(pfn(dimg))
        p = psnr(out, golden)
        spf = device_timer(lambda s: pfn(s)[:1080, :1920, :], dimg, 50, ov)
        log(f"lanczos3 PALLAS fused: {1/spf:7.1f} fps  psnr {p:.1f} dB")
    except Exception as e:  # noqa: BLE001
        s = str(e)
        j = s.find("Mosaic")
        log(f"pallas resample failed: {s[j:j+300] if j>=0 else s[:300]}")

    # --- 4. vertical tile-size sweep for the banded form ------------------
    for tcv in (32, 64, 128, 256):
        bv = resample._banded_axis(1080, 2160, "lanczos3", tcv)
        bh = resample._banded_axis(1920, 3840, "lanczos3", 128)
        if bv is None or bh is None:
            log(f"tc_v={tcv}: no tiling")
            continue
        import functools

        body = functools.partial(
            resample._banded_body, banded_v=bv, banded_h=bh,
            out_h=2160, out_w=3840,
        )
        fn = jax.jit(body)
        out = np.asarray(fn(dimg))
        p = psnr(out, golden)
        spf = device_timer(lambda s, fn=fn: fn(s)[:1080, :1920, :], dimg, 50, ov)
        log(f"lanczos3 tc_v={tcv:4}: {1/spf:7.1f} fps  psnr {p:.1f} dB")

    # --- 5. EASU stage profile --------------------------------------------
    from nu_scaler_tpu.ops import fsr as fsr_ops

    t = device_timer(
        lambda s: fsr_ops.easu_polyphase(s, 2, 0.17)[:1080, :1920, :], dimg, 5, ov
    )
    log(f"easu_polyphase 1080p→4K: {t*1000:.2f} ms ({1/t:.1f} fps)")
    t = device_timer(lambda s: fsr_ops.rcas(s, 0.17)[:1080, :1920, :], dimg, 10, ov)
    log(f"rcas @1080p: {t*1000:.2f} ms")

    log("DONE")


if __name__ == "__main__":
    main()
