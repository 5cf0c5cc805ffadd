"""END-TO-END pipeline quality: ground-truth 4K60 vs our 1080p30 → 4K60
reconstruction, per technology tier — the system-level number no per-kernel
gate measures (reference role: the whole live loop main.py:951-1111 /
the FSR3 offline sketch fsr3.rs:319-376, which the reference never scored).

Protocol per held-out seed:
  1. render the ground-truth clip at 2160×3840 (odd+even frames = "60 fps")
  2. derive the input stream: area-downsample 2× → C420 video path → keep
     even frames only ("1080p30" source, chroma-subsampled like real video)
  3. reconstruct 4K60: upscale each input frame (per-tier upscaler) and
     motion-interpolate each in-between frame (per-tier mid path)
  4. score PSNR/SSIM vs ground truth, split into upscaled (even) and
     interpolated (odd) frames

Tiers:
  blend         lanczos3 + cross-fade mid        (the reference-shipped path)
  flow_soft     lanczos3 + production MC warp
  flow_soft_ref lanczos3 + MC warp + learned refinement (phase-domain path)
  fsr           EASU+RCAS + production MC warp
  dlss_soft     learned SR (int8 quality ladder) + plain MC mid through
                the learned SR
  dlss_ref      learned SR + REFINED MC mid through the learned SR
                (`nu-scaler transcode --technology dlss --interp-mode
                flow_soft_ref`)

Usage:
    python tools/e2e_quality_eval.py [--cpu] [--seeds 900 901] [--frames 9]
        [--tiers blend flow_soft ...] [--height 2160 --width 3840]
Run the 4K table on the TPU (background, no timeout-kill).
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL_TIERS = ("blend", "flow_soft", "flow_soft_ref", "fsr", "dlss_soft", "dlss_ref")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--height", type=int, default=2160, help="ground-truth H")
    ap.add_argument("--width", type=int, default=3840, help="ground-truth W")
    ap.add_argument("--seeds", type=int, nargs="+", default=[900, 901])
    ap.add_argument("--frames", type=int, default=9,
                    help="ground-truth frames (odd: evens are inputs)")
    ap.add_argument("--tiers", nargs="+", default=list(ALL_TIERS),
                    choices=ALL_TIERS)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nu_scaler_tpu.models.data import clip_through_video_path, render_clip
    from nu_scaler_tpu.ops import fsr as fsr_ops
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.ops.metrics import psnr, ssim

    oh, ow = args.height, args.width
    ih, iw = oh // 2, ow // 2
    print(f"device {jax.devices()[0]}  GT {oh}x{ow} → input {ih}x{iw}@half-rate",
          flush=True)

    down = resample.make_resampler(oh, ow, ih, iw, "area")
    up_l3 = resample.make_resampler(ih, iw, oh, ow, "lanczos3")

    def build_tier(name):
        """(up_frame, mid4k) — mid4k(a, b) consumes INPUT-res u8 frames."""
        if name == "blend":
            return up_l3, jax.jit(
                lambda a, b: up_l3(I.blend_only(a, b, 0.5))
            )
        if name == "flow_soft":
            return up_l3, jax.jit(
                lambda a, b: up_l3(I.soft_interp_fast(a, b, 0.5))
            )
        if name == "flow_soft_ref":
            return up_l3, I.make_refined_mid_upscaler(ih, iw, oh, ow)
        if name == "fsr":
            fsr_up = fsr_ops.make_fsr_upscaler(ih, iw, oh, ow, "quality")
            return fsr_up, jax.jit(
                lambda a, b: fsr_up(I.soft_interp_fast(a, b, 0.5))
            )
        if name in ("dlss_soft", "dlss_ref"):
            from nu_scaler_tpu.models.esrgan_lite import make_pretrained_upscaler
            from nu_scaler_tpu.models.interp_refine import get_refine_graph

            sr = make_pretrained_upscaler(ih, iw, oh, ow)
            ref = get_refine_graph(ih, iw) if name == "dlss_ref" else None

            def mid4k(a, b, _ref=ref):
                mid = I.soft_interp_fast(a, b, 0.5)
                if _ref is not None:
                    mid = _ref(a, b, mid)
                return sr(mid)

            return sr, jax.jit(mid4k)
        raise ValueError(name)

    scores: dict = {t: {"even": [], "odd": []} for t in args.tiers}
    for seed in args.seeds:
        gt = render_clip(oh, ow, frames=args.frames, seed=seed)
        lr = [np.asarray(down(jnp.asarray(f))) for f in gt]
        lr = clip_through_video_path(lr)
        inputs = [jnp.asarray(lr[k]) for k in range(0, len(lr), 2)]
        for tier in args.tiers:
            up_frame, mid4k = build_tier(tier)
            for j, frame in enumerate(inputs):
                out = np.asarray(up_frame(frame))
                truth = gt[2 * j]
                scores[tier]["even"].append((psnr(out, truth), ssim(out, truth)))
            for j in range(len(inputs) - 1):
                out = np.asarray(
                    mid4k(inputs[j], inputs[j + 1])
                    if tier != "flow_soft_ref"
                    else mid4k(inputs[j], inputs[j + 1], 0.5)
                )
                truth = gt[2 * j + 1]
                scores[tier]["odd"].append((psnr(out, truth), ssim(out, truth)))
            print(f"seed {seed} {tier}: done", flush=True)

    def fmt(vals):
        p = float(np.mean([v[0] for v in vals]))
        s = float(np.mean([v[1] for v in vals]))
        return f"{p:6.2f} dB / {s:.4f}"

    print(f"\n{'tier':14} {'ALL':>22} {'upscaled (even)':>22} "
          f"{'interpolated (odd)':>22}", flush=True)
    for tier in args.tiers:
        ev, od = scores[tier]["even"], scores[tier]["odd"]
        print(f"{tier:14} {fmt(ev + od):>22} {fmt(ev):>22} {fmt(od):>22}",
              flush=True)


if __name__ == "__main__":
    main()
