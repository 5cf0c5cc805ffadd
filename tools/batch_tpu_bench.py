"""TPU bench: batched fused resampler + batched FSR + calibrated interp ms.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/batch_tpu_bench.py
(background, no timeout-kill).
"""

import numpy as np

import jax
import jax.numpy as jnp

from nu_scaler_tpu.kernels.resample_pallas import make_pallas_fused, make_pallas_fused_batched
from nu_scaler_tpu.ops import fsr as fsr_ops
from nu_scaler_tpu.ops import resample
from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

IN_H, IN_W, OUT_H, OUT_W = 1080, 1920, 2160, 3840


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    overhead = fetch_overhead_s()
    iters = 30 if dev.platform == "tpu" else 2
    rng = np.random.default_rng(0)

    def t(fn, state, label, frames=1):
        spf = device_timer(fn, state, iters=iters, overhead_s=overhead)
        print(f"{label:40s} {spf*1000:8.3f} ms/call  {frames/spf:8.1f} frames/s", flush=True)
        return spf

    # single fused resampler (baseline)
    single = make_pallas_fused(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")
    img = jax.device_put(jnp.asarray(rng.integers(0, 256, (IN_H, IN_W, 4), np.uint8)))
    t(lambda s: single(s)[:IN_H, :IN_W, :], img, "fused single lanczos3", 1)

    # batched fused resampler
    for n in (4, 8):
        bfn = make_pallas_fused_batched(n, IN_H, IN_W, OUT_H, OUT_W, "lanczos3")
        imgs = jax.device_put(
            jnp.asarray(rng.integers(0, 256, (n, IN_H, IN_W, 4), np.uint8))
        )
        try:
            t(lambda s: bfn(s)[:, :IN_H, :IN_W, :], imgs, f"fused batched n={n} lanczos3", n)
        except Exception as e:
            print(f"batched n={n} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    # the public make_resampler dispatch on a batch (einsum vs pallas route)
    up = resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, "lanczos3")
    imgs4 = jax.device_put(jnp.asarray(rng.integers(0, 256, (4, IN_H, IN_W, 4), np.uint8)))
    t(lambda s: up(s)[:, :IN_H, :IN_W, :], imgs4, "make_resampler batch n=4 dispatch", 4)

    # batched FSR pipeline
    fsr_fn = fsr_ops.make_fsr_upscaler(IN_H, IN_W, OUT_H, OUT_W, "quality")
    t(lambda s: fsr_fn(s)[:IN_H, :IN_W, :], img, "fsr pipeline single", 1)
    try:
        fsr4 = jax.jit(fsr_ops._fused_phase_pipeline(IN_H, IN_W, 2, fsr_ops.FSR_SHARPNESS["quality"]))
        t(lambda s: fsr4(s)[:, :IN_H, :IN_W, :], imgs4, "fsr pipeline batched n=4", 4)
    except Exception as e:
        print(f"fsr batched FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    # calibrated interpolator duration through the public API
    import nu_scaler_core as nsc

    interp = nsc.WgpuFrameInterpolator()
    a = rng.integers(0, 256, (IN_H, IN_W, 4), np.uint8)
    b = rng.integers(0, 256, (IN_H, IN_W, 4), np.uint8)
    interp.interpolate_py(a.tobytes(), b.tobytes(), IN_W, IN_H)
    print(f"interp blend 1080p get_last_gpu_duration_ms: {interp.get_last_gpu_duration_ms():.3f} ms", flush=True)
    fi = nsc.create_interpolator("flow")
    fi.interpolate_py(a.tobytes(), b.tobytes(), IN_W, IN_H)
    print(f"interp flow  1080p duration: {fi.get_last_gpu_duration_ms():.3f} ms", flush=True)
    print(f"interp flow  detail: {fi.get_last_gpu_duration_detail()}", flush=True)


if __name__ == "__main__":
    main()
