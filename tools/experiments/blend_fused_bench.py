"""TPU A/B: amortized blend step with XLA 4K blend (production, 1.54 ms)
vs the blend fused into the resampler kernel (make_pallas_fused_blend —
one pallas_call emits cur_up + mid). Run on the TPU, background."""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")

import jax

import bench


def log(*a):
    print(*a, flush=True)


def main() -> None:
    log(f"device {jax.devices()[0]}")
    r = bench.bench_pipeline("blend_amortized", 100, 0.0)
    log(f"blend (XLA 4K blend)   : {r['step_ms']:7.3f} ms/step → {r['fps']:7.1f} out-fps")
    r = bench.bench_pipeline("blend_fused", 100, 0.0)
    log(f"blend-f (fused kernel) : {r['step_ms']:7.3f} ms/step → {r['fps']:7.1f} out-fps")
    r = bench.bench_pipeline("blend_fused_3x", 100, 0.0)
    log(f"blend-3x (fused, 2 mids): {r['step_ms']:7.3f} ms/step → {r['fps']:7.1f} out-fps")


if __name__ == "__main__":
    main()
