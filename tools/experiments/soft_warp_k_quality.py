"""Quality cost of reducing the soft-warp candidate count K (CPU, XLA path).

The Pallas strip kernel's time is ~0.21 ms per candidate-slab pair at 1080p
(soft_warp_split2), so K=8 → K=4 saves ~0.9 ms — IF quality holds. The
candidate selection/assignment math is identical between the XLA
`_soft_warp_accumulate` path and the Pallas kernel, so K's quality effect is
measured here on CPU with the XLA path.

Scene: panning textured background + counter-moving sprite + a shear band
(three motion populations — the hard case for a global top-K candidate set).

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
    vy, vx = 2, 5       # background pan per frame
    sy, sx = 3, -6      # sprite velocity
    s2y, s2x = -4, 2    # second sprite velocity

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

    f0, truth, f2 = frame(0), frame(1), frame(2)
    flow = I.compute_flow_fast(jnp.asarray(f0), jnp.asarray(f2))

    print("mode                    PSNR    SSIM", flush=True)
    blend = np.asarray(I.blend_only(jnp.asarray(f0), jnp.asarray(f2), 0.5))
    print(f"blend                 {psnr(blend, truth):6.2f}  {ssim(blend, truth):.4f}")

    for k in (8, 6, 4, 3, 2):
        a4 = jnp.asarray(f0).astype(jnp.float32).transpose(2, 0, 1)[:3]
        b4 = jnp.asarray(f2).astype(jnp.float32).transpose(2, 0, 1)[:3]
        t = 0.5
        acc = I._soft_warp_accumulate(
            None, a4, -t * flow, k=k, rng=I.WARP_RANGE, tile=I.WARP_TILE,
            weight=1.0 - t)
        acc = I._soft_warp_accumulate(
            acc, b4, (1.0 - t) * flow, k=k, rng=I.WARP_RANGE, tile=I.WARP_TILE,
            weight=t)
        out = (acc[0][:, :, :w] + acc[1][:, :, 1:]).astype(jnp.float32)
        mid = np.empty((h, w, 4), np.uint8)
        mid[..., :3] = np.clip(
            np.round(np.asarray(out).transpose(1, 2, 0)), 0, 255
        ).astype(np.uint8)
        mid[..., 3] = 255
        print(f"soft k={k}              {psnr(mid, truth):6.2f}  {ssim(mid, truth):.4f}",
              flush=True)

    # also rng ladder at k=8 and k=4 (affects candidate clipping + assignment)
    for k, rr in ((8, 24), (4, 24)):
        a4 = jnp.asarray(f0).astype(jnp.float32).transpose(2, 0, 1)[:3]
        b4 = jnp.asarray(f2).astype(jnp.float32).transpose(2, 0, 1)[:3]
        t = 0.5
        acc = I._soft_warp_accumulate(
            None, a4, -t * flow, k=k, rng=rr, tile=I.WARP_TILE, weight=1.0 - t)
        acc = I._soft_warp_accumulate(
            acc, b4, (1.0 - t) * flow, k=k, rng=rr, tile=I.WARP_TILE, weight=t)
        out = (acc[0][:, :, :w] + acc[1][:, :, 1:]).astype(jnp.float32)
        mid = np.empty((h, w, 4), np.uint8)
        mid[..., :3] = np.clip(
            np.round(np.asarray(out).transpose(1, 2, 0)), 0, 255
        ).astype(np.uint8)
        mid[..., 3] = 255
        print(f"soft k={k} rng={rr}       {psnr(mid, truth):6.2f}  {ssim(mid, truth):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
