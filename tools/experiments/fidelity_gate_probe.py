"""Measure on-chip PSNR of EVERY production output path vs its golden or CPU
twin at production shapes (1080p→4K) — the numbers that set the hard
per-algorithm fidelity gates in bench.py (VERDICT r3 next-#1). Also answers
whether the in-process CPU backend is reachable under axon (needed for the
flow_soft / flow_soft_ref twins, which have no numpy golden).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/experiments/fidelity_gate_probe.py
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


IN_H, IN_W, OUT_H, OUT_W = 1080, 1920, 2160, 3840


def main() -> None:
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.kernels import reference as ref
    from nu_scaler_tpu.ops import fsr as fsr_ops
    from nu_scaler_tpu.ops import interpolate as interp_ops
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.ops.metrics import psnr

    log(f"device {jax.devices()[0]}")
    try:
        cpu = jax.devices("cpu")[0]
        log(f"cpu backend reachable in-process: {cpu}")
    except Exception as e:  # noqa: BLE001
        cpu = None
        log(f"cpu backend NOT reachable: {e}")

    frame = generate_test_pattern(IN_W, IN_H)
    frame[480:600, 640:760, :3] = 255
    frame_b = np.roll(frame, 16, axis=1)
    dev_a = jax.device_put(frame)
    dev_b = jax.device_put(frame_b)

    # 1. resamplers vs numpy goldens
    for algo in ("lanczos3", "bilinear", "bicubic"):
        out = np.asarray(resample.make_resampler(IN_H, IN_W, OUT_H, OUT_W, algo)(dev_a))
        golden = ref.separable_resample_ref(frame, OUT_H, OUT_W, algo)
        log(f"psnr[{algo}] = {psnr(out, golden):.2f} dB")

    # 2. FSR quality tier vs easu+rcas golden
    out = np.asarray(fsr_ops.make_fsr_upscaler(IN_H, IN_W, OUT_H, OUT_W, "quality")(dev_a))
    sharp = ref.FSR_SHARPNESS["quality"]
    golden = ref.rcas_ref(ref.easu_ref(frame, OUT_H, OUT_W, sharp), sharp)
    log(f"psnr[fsr] = {psnr(out, golden):.2f} dB")

    # 3. fused blend kernel: upscale output + mid vs goldens
    from nu_scaler_tpu.kernels.resample_pallas import make_pallas_fused_blend

    fb = make_pallas_fused_blend(IN_H, IN_W, OUT_H, OUT_W, "lanczos3", (0.5,))
    up_golden_a = ref.separable_resample_ref(frame, OUT_H, OUT_W, "lanczos3")
    up_golden_b = ref.separable_resample_ref(frame_b, OUT_H, OUT_W, "lanczos3")
    prev2d = jnp.asarray(
        np.ascontiguousarray(up_golden_a.reshape(fb.out2d))
    )
    outs = fb(dev_b, prev2d)
    cur_up = np.asarray(outs[0]).reshape(OUT_H, OUT_W, 4)
    mid = np.asarray(outs[1]).reshape(OUT_H, OUT_W, 4)
    mid_golden = ref.warp_blend_ref(
        up_golden_a, up_golden_b, np.zeros((OUT_H, OUT_W, 2), np.float32), 0.5
    )
    log(f"psnr[blend_fused_up]  = {psnr(cur_up, up_golden_b):.2f} dB")
    log(f"psnr[blend_fused_mid] = {psnr(mid, mid_golden):.2f} dB")

    # 3b. plain blend_only vs golden
    bo = np.asarray(interp_ops.blend_only(jnp.asarray(up_golden_a), jnp.asarray(up_golden_b), 0.5))
    log(f"psnr[blend_only] = {psnr(bo, mid_golden):.2f} dB")

    # 4. flow_soft mid vs CPU twin
    if cpu is not None:
        tpu_mid = np.asarray(interp_ops.soft_interp_fast(dev_a, dev_b, 0.5))
        with jax.default_device(cpu):
            cpu_mid = np.asarray(
                interp_ops.soft_interp_fast(
                    jax.device_put(frame, cpu), jax.device_put(frame_b, cpu), 0.5
                )
            )
        log(f"psnr[flow_soft vs cpu twin] = {psnr(tpu_mid, cpu_mid):.2f} dB  "
            f"max|d|={np.abs(tpu_mid.astype(int)-cpu_mid.astype(int)).max()}")

    # 5. flow_soft_ref refined 4K output vs CPU twin
    from nu_scaler_tpu.models.interp_refine import refine_available

    if refine_available() and cpu is not None:
        mid_up = interp_ops.make_refined_mid_upscaler(IN_H, IN_W, OUT_H, OUT_W)
        tpu_out = np.asarray(mid_up(dev_a, dev_b, 0.5))
        with jax.default_device(cpu):
            mid_up_c = interp_ops.make_refined_mid_upscaler(IN_H, IN_W, OUT_H, OUT_W)
            cpu_out = np.asarray(
                mid_up_c(jax.device_put(frame, cpu), jax.device_put(frame_b, cpu), 0.5)
            )
        log(f"psnr[flow_soft_ref vs cpu twin] = {psnr(tpu_out, cpu_out):.2f} dB  "
            f"max|d|={np.abs(tpu_out.astype(int)-cpu_out.astype(int)).max()}")

    # 6. esrgan served grid vs its quant-apply twin, both on-chip
    from nu_scaler_tpu.models import esrgan_lite as el
    from nu_scaler_tpu.models import train as tr

    efn = el.make_pretrained_upscaler(IN_H, IN_W, OUT_H, OUT_W)
    served = np.asarray(efn(dev_a))
    arch = getattr(efn, "arch", "tpu4")
    arch_kw = {e[0]: e[1] for e in el._ARCH_LADDER["quality"]}.get(
        arch, dict(stride=4, features=128)
    )
    params, step = tr.load_checkpoint(1, arch)
    model = el.ESRGANLiteTPU(upscale=2, **arch_kw)
    lr = frame[None, ..., :3].astype(np.float32) / 255.0
    if getattr(efn, "quantized", False):
        twin_fn = el.make_quant_apply(model, params, tr.load_act_scales(1, arch, step))
    else:
        twin_fn = jax.jit(lambda x: model.apply(params, x))
    twin = np.asarray(twin_fn(jnp.asarray(lr)))[0]
    twin_u8 = np.clip(np.round(twin * 255.0), 0, 255).astype(np.uint8)
    d = served[..., :3].astype(int) - twin_u8.astype(int)
    p = 10 * np.log10(255.0**2 / max(float(np.mean(d.astype(float) ** 2)), 1e-12))
    log(f"psnr[esrgan served({arch}{'-int8' if getattr(efn,'quantized',False) else ''}) "
        f"vs twin] = {p:.2f} dB  mean|d|={np.abs(d).mean():.3f}")

    log("probe done")


if __name__ == "__main__":
    main()
