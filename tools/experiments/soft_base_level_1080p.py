"""base_level=1 vs 2 quality at PRODUCTION scale (1080p, CPU interpret).

The 288p probe (soft_refine_quality.py) showed −0.02/−0.34 dB for
quarter-res flow; 288p is pessimistic (the (8,128) tile covers far more of
the frame). Measure at 1080p where flow_soft actually runs.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/.axon_site:/root/repo python ...
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, "/root/repo/tests")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nu_scaler_tpu.kernels.soft_warp_pallas import soft_warp_blend
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops.metrics import psnr, ssim
    from test_flow_quality import _smooth_noise

    rng = np.random.default_rng(11)
    h, w = 1080, 1920
    margin = 64

    base = np.stack(
        [_smooth_noise(rng, h + 2 * margin, w + 2 * margin) for _ in range(3)], -1
    )
    sprite = np.stack([_smooth_noise(rng, 160, 160) for _ in range(3)], -1)

    def zr_frame(k, pan=(3, 7), spr=(5, -9)):
        ang = 0.006 * k
        scale = 1.0 + 0.005 * k
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        cy, cx = h / 2, w / 2
        ys = (yy - cy) * np.cos(ang) - (xx - cx) * np.sin(ang)
        xs = (yy - cy) * np.sin(ang) + (xx - cx) * np.cos(ang)
        ys = ys / scale + cy + margin + k * pan[0]
        xs = xs / scale + cx + margin + k * pan[1]
        y0 = np.clip(ys.astype(int), 0, base.shape[0] - 2)
        x0 = np.clip(xs.astype(int), 0, base.shape[1] - 2)
        fy = np.clip(ys - y0, 0, 1)[..., None]
        fx = np.clip(xs - x0, 0, 1)[..., None]
        v = (
            base[y0, x0] * (1 - fy) * (1 - fx)
            + base[y0, x0 + 1] * (1 - fy) * fx
            + base[y0 + 1, x0] * fy * (1 - fx)
            + base[y0 + 1, x0 + 1] * fy * fx
        )
        py, px = 400 + k * spr[0], 1200 + k * spr[1]
        v[py : py + 160, px : px + 160] = sprite
        fr = np.empty((h, w, 4), np.uint8)
        fr[..., :3] = np.clip(v * 255.0, 0, 255).astype(np.uint8)
        fr[..., 3] = 255
        return fr

    f0, truth, f2 = zr_frame(0), zr_frame(1), zr_frame(2)
    th, tw = I.WARP_TILE

    blend = np.asarray(I.blend_only(jnp.asarray(f0), jnp.asarray(f2), 0.5))
    print(f"blend           {psnr(blend, truth):6.2f} dB  {ssim(blend, truth):.4f}",
          flush=True)

    for bl in (1, 2, 3):
        half = I.compute_flow_fast(
            jnp.asarray(f0), jnp.asarray(f2), base_level=bl, upsample=False
        )
        s = 2 ** bl
        tiles = I._tile_mean(half, th // s, tw // s) * float(s)
        mid = np.asarray(
            soft_warp_blend(
                jnp.asarray(f0), jnp.asarray(f2), None, 0.5,
                rng=I.WARP_RANGE, k=I.SOFT_WARP_K, tiles=tiles,
            )
        )
        print(f"soft base_level={bl}  {psnr(mid, truth):6.2f} dB  "
              f"{ssim(mid, truth):.4f}", flush=True)


if __name__ == "__main__":
    main()
