"""On-chip measurement of one awkward (non-tiling) resample scale — VERDICT
r2 #7: the dense weight-matrix fallback must beat the old jnp.take gather
bodies (8-20 ms/frame per CLAUDE.md) on the scales the banded tiler can't
cover. Run on the TPU (default axon env), in the background, uninterrupted:

    PYTHONPATH=/root/.axon_site:/root/repo python tools/experiments/awkward_scale_bench.py
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
    from nu_scaler_tpu.kernels import reference as ref
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.ops.metrics import psnr
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    # 1920x1080 -> 2633x1481: an irrational-ish scale (~1.3714x) that the
    # banded tiler cannot express — the exact case VERDICT r2 #7 names.
    in_h, in_w, out_h, out_w = 1080, 1920, 1481, 2633
    img = generate_test_pattern(in_w, in_h)
    x = jnp.asarray(img)

    def chain(u8, out):
        return jnp.clip(
            u8.astype(jnp.float32) + out[0, 0, 0].astype(jnp.float32) * 1e-6, 0, 255
        ).astype(jnp.uint8)

    for algo in ("nearest", "bilinear", "lanczos3"):
        fn = resample.make_resampler(in_h, in_w, out_h, out_w, algo)
        out = np.asarray(fn(x))
        if algo == "nearest":
            gold = ref.nearest_ref(img, out_h, out_w)
            fid = "bit-exact" if np.array_equal(out, gold) else "MISMATCH"
        elif algo == "bilinear":
            fid = f"{psnr(out, ref.bilinear_ref(img, out_h, out_w)):.1f} dB"
        else:
            fid = f"{psnr(out, ref.separable_resample_ref(img, out_h, out_w, algo)):.1f} dB"

        t = device_timer(lambda s, fn=fn: chain(s, fn(s)), x, 10, ov)
        log(
            f"dense[{algo:9s}] {in_w}x{in_h} -> {out_w}x{out_h}: "
            f"{t*1000:7.2f} ms/frame ({1.0/t:6.1f} fps)  fidelity {fid}"
        )

    # the old gather body, for the record (what the fallback replaced)
    def _gather_nearest(img8):
        ys = (jnp.arange(out_h, dtype=jnp.int32) * in_h) // out_h
        xs = (jnp.arange(out_w, dtype=jnp.int32) * in_w) // out_w
        return jnp.take(jnp.take(img8, ys, axis=-3), xs, axis=-2)

    g = jax.jit(_gather_nearest)
    t = device_timer(lambda s: chain(s, g(s)), x, 5, ov)
    log(f"gather[nearest  ] (old jnp.take body): {t*1000:7.2f} ms/frame ({1.0/t:6.1f} fps)")


if __name__ == "__main__":
    main()
