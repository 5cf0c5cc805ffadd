"""ESRGAN learned-tier TPU bench: inference fps (ShiftConv vs baseline had
19 ms) + held-out quality vs lanczos3.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/esrgan_tpu_bench.py
(background, no timeout-kill).
"""

import numpy as np

import jax
import jax.numpy as jnp

from nu_scaler_tpu.models import esrgan_lite as el
from nu_scaler_tpu.models import train as T
from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

IN_H, IN_W = 1080, 1920


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    overhead = fetch_overhead_s()
    iters = 30 if dev.platform == "tpu" else 2

    fn = el.make_pretrained_upscaler(IN_H, IN_W, IN_H * 2, IN_W * 2)
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.integers(0, 256, (IN_H, IN_W, 4), np.uint8)))

    spf = device_timer(
        lambda s: fn(s)[: IN_H, : IN_W, :], img, iters=iters, overhead_s=overhead
    )
    print(f"esrgan 1080p->4K: {spf*1000:.3f} ms  {1.0/spf:.1f} fps", flush=True)

    print("eval vs lanczos3 (held-out clips):", flush=True)
    import os
    arch = "tpu4" if os.path.exists(T.ckpt_dir(1, "tpu4")) else "tpu"
    T.evaluate(stages=1, arch=arch)


if __name__ == "__main__":
    main()
