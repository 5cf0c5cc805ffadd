"""FSR EASU+RCAS TPU tuning bench: XLA vs Pallas, TH sweep, stage split.

Run on the TPU (default env), in the background, uninterrupted.
Details to stderr; summary lines to stdout.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from nu_scaler_tpu.kernels import fsr_pallas
from nu_scaler_tpu.ops import fsr as fsr_ops
from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

IN_H, IN_W, S = 1080, 1920, 2


def log(msg):
    print(msg, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    overhead = fetch_overhead_s()
    log(f"fetch overhead {overhead*1000:.2f} ms")
    iters = 50 if dev.platform == "tpu" else 3

    rng = np.random.default_rng(0)
    img = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (IN_H, IN_W, 4), np.uint8))
    )

    def time_fn(fn, state, label):
        spf = device_timer(fn, state, iters=iters, overhead_s=overhead)
        log(f"{label:34s} {spf*1000:8.3f} ms  {1.0/spf:8.1f} fps")
        return spf

    # full pipelines
    fx = fsr_ops.make_fsr_upscaler(IN_H, IN_W, IN_H * S, IN_W * S, "quality", impl="xla")
    time_fn(lambda s: fx(s)[:IN_H, :IN_W, :], img, "full xla polyphase")

    for th in (8, 16, 32):
        sharp = fsr_ops.FSR_SHARPNESS["quality"]
        try:
            phase_fn = fsr_pallas.make_fsr_phase_kernel.__wrapped__(
                IN_H, IN_W, S, sharp, th
            )
            rgb_p = img[..., :3].astype(jnp.float32).transpose(2, 0, 1) * (1 / 255.0)
            rgb_p = jax.block_until_ready(jax.device_put(rgb_p))
            pj = jax.jit(phase_fn)

            def kbody(s):
                out = pj(s)
                return s + out[0].astype(jnp.float32) * 1e-9

            time_fn(kbody, rgb_p, f"phase kernel only th={th}")
        except Exception as e:
            log(f"th={th} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # full pallas pipeline (default th)
    fp = jax.jit(fsr_ops._fused_phase_pipeline(IN_H, IN_W, S, fsr_ops.FSR_SHARPNESS["quality"]))
    time_fn(lambda s: fp(s)[:IN_H, :IN_W, :], img, "full pallas pipeline")

    # stage split: planar prep / interleave+pack
    def prep(s):
        p = s[..., :3].astype(jnp.float32).transpose(2, 0, 1) * (1 / 255.0)
        return s + p[0, :, :1920].astype(jnp.uint8) * 0  # keep shape, keep live

    def prep2(s):
        p = s[..., :3].astype(jnp.float32).transpose(2, 0, 1) * (1 / 255.0)
        return (s.astype(jnp.float32) + p.transpose(1, 2, 0).sum(-1, keepdims=True) * 1e-9).astype(jnp.uint8)

    time_fn(prep2, img, "planar prep only")

    # fidelity check vs xla path on-chip
    a = np.asarray(fp(img))
    b = np.asarray(fx(img))
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    p = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    log(f"pallas vs xla on-chip PSNR: {p:.1f} dB")


if __name__ == "__main__":
    main()
