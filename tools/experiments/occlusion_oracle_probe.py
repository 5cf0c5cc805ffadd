"""Is occlusion-adaptive blending worth building? Oracle probe.

The soft warp mixes warp(A→t) and warp(B→t) with fixed (1−t, t) weights.
The reference's FSR3 tier blended with an occlusion-confidence weight
(fsr3.rs:319-376). This probe measures the CEILING of that idea: per-pixel
ORACLE choice among {warp A only, warp B only, fixed mix} against the true
middle frame on the held-out clip scenes. If even the oracle only gains a
fraction of a dB over the fixed mix, adaptive weighting can't pay.

Run: PYTHONPATH=/root/.axon_site:/root/repo python ... (CPU, 288p)."""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nu_scaler_tpu.models.data import clip_through_video_path, render_clip
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops.metrics import psnr

    t = 0.5
    for seed in (900, 901):
        clip = clip_through_video_path(render_clip(288, 512, frames=3, seed=seed))
        a, truth, b = clip[0], clip[1], clip[2]
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        flow = I.compute_flow_fast(aj, bj)

        # individual warped sides (planar block warp, the same machinery the
        # pair warp uses; WGSL convention warp_blend.wgsl:29-43 — sample A
        # at pos − t·flow, B at pos + (1−t)·flow)
        ap = aj[..., :3].astype(jnp.float32).transpose(2, 0, 1)
        bp = bj[..., :3].astype(jnp.float32).transpose(2, 0, 1)
        wa = np.asarray(I.block_warp_planar(ap, flow * -t)).transpose(1, 2, 0)
        wb = np.asarray(I.block_warp_planar(bp, flow * (1.0 - t))).transpose(1, 2, 0)
        tr = truth[..., :3].astype(np.float64)

        mix = 0.5 * (wa + wb)
        prod = np.asarray(I.warp_blend_fast(aj, bj, flow, t))[..., :3]

        # oracle: per pixel pick the candidate closest to the truth
        cands = np.stack([wa, wb, mix])  # [3, H, W, C]
        err = np.abs(cands - tr[None]).sum(-1)
        pick = err.argmin(0)
        oracle = np.take_along_axis(
            cands, pick[None, ..., None], axis=0
        )[0]

        print(f"seed {seed}:")
        print(f"  warp A only    {psnr(wa, tr):6.2f} dB")
        print(f"  warp B only    {psnr(wb, tr):6.2f} dB")
        print(f"  fixed mix      {psnr(mix, tr):6.2f} dB")
        print(f"  production     {psnr(prod, tr):6.2f} dB")
        print(f"  ORACLE pick    {psnr(oracle, tr):6.2f} dB  "
              f"(ceiling over mix: {psnr(oracle, tr) - psnr(mix, tr):+.2f} dB; "
              f"A/B/mix share {np.bincount(pick.ravel(), minlength=3) / pick.size})",
              flush=True)


if __name__ == "__main__":
    main()
