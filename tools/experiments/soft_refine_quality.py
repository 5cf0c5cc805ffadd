"""Quality cost of lowering refine_iters in the fused flow_soft front end.

The v7b timing ladder (soft_warp_v7b_bench.py) measured refine=4 at
4.432 ms/step (451.3 out-fps) vs refine=8 at 4.521 ms (442.4) — worth
shipping only if the tile-mean flow quality holds. The refine iterations
run at base_level=1 and the soft warp consumes only per-tile (4x64 at
half res) means, so most refinement detail is averaged away; measure it.

Scenes: (a) the 3-motion-population scene from soft_warp_k_quality.py,
(b) a zoom+rotate scene (spatially varying flow — the case where per-tile
motion needs accurate local flow the most).

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

    rng = np.random.default_rng(7)
    h, w = 288, 512
    margin = 48

    canvas = np.stack(
        [_smooth_noise(rng, h + 2 * margin, w + 2 * margin) for _ in range(3)], -1
    )
    sprite = np.stack([_smooth_noise(rng, 56, 56) for _ in range(3)], -1)
    sprite2 = np.stack([_smooth_noise(rng, 40, 40) for _ in range(3)], -1)
    vy, vx = 2, 5
    sy, sx = 3, -6
    s2y, s2x = -4, 2

    def frame(k):
        view = canvas[
            margin + k * vy : margin + k * vy + h,
            margin + k * vx : margin + k * vx + w,
        ].copy()
        py, px = 60 + k * sy, 300 + k * sx
        view[py : py + 56, px : px + 56] = sprite
        qy, qx = 180 + k * s2y, 90 + k * s2x
        view[qy : qy + 40, qx : qx + 40] = sprite2
        fr = np.empty((h, w, 4), np.uint8)
        fr[..., :3] = np.clip(view * 255.0, 0, 255).astype(np.uint8)
        fr[..., 3] = 255
        return fr

    # scene (b): zoom + rotate about the center
    base = np.stack([_smooth_noise(rng, h + 2 * margin, w + 2 * margin) for _ in range(3)], -1)

    def zr_frame(k):
        ang = 0.01 * k
        scale = 1.0 + 0.008 * k
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        cy, cx = h / 2, w / 2
        ys = (yy - cy) * np.cos(ang) - (xx - cx) * np.sin(ang)
        xs = (yy - cy) * np.sin(ang) + (xx - cx) * np.cos(ang)
        ys = ys / scale + cy + margin
        xs = xs / scale + cx + margin
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
        fr = np.empty((h, w, 4), np.uint8)
        fr[..., :3] = np.clip(v * 255.0, 0, 255).astype(np.uint8)
        fr[..., 3] = 255
        return fr

    th, tw = I.WARP_TILE

    def run(f0, truth, f2, refine, base_level=1):
        half = I.compute_flow_fast(
            jnp.asarray(f0), jnp.asarray(f2),
            base_level=base_level, upsample=False, refine_iters=refine,
        )
        s = 2 ** base_level
        tiles = I._tile_mean(half, th // s, tw // s) * float(s)
        mid = np.asarray(
            soft_warp_blend(
                jnp.asarray(f0), jnp.asarray(f2), None, 0.5,
                rng=I.WARP_RANGE, k=I.SOFT_WARP_K, tiles=tiles,
            )
        )
        return psnr(mid, truth), ssim(mid, truth)

    for name, trio in (
        ("3-motion", (frame(0), frame(1), frame(2))),
        ("zoom+rot", (zr_frame(0), zr_frame(1), zr_frame(2))),
    ):
        f0, truth, f2 = trio
        blend = np.asarray(I.blend_only(jnp.asarray(f0), jnp.asarray(f2), 0.5))
        print(f"[{name}] blend              {psnr(blend, truth):6.2f} dB  "
              f"{ssim(blend, truth):.4f}", flush=True)
        for refine in (8, 6, 4, 2, 1):
            p, s = run(f0, truth, f2, refine)
            print(f"[{name}] soft refine={refine}      {p:6.2f} dB  {s:.4f}",
                  flush=True)
        for bl in (2, 3):
            p, s = run(f0, truth, f2, 8, base_level=bl)
            print(f"[{name}] soft base_level={bl}  {p:6.2f} dB  {s:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
