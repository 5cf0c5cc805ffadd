"""Frame-interpolation quality on held-out clips: predict each clip's odd
frames from their neighbors and score PSNR/SSIM vs the true middle frame,
per interpolation mode — the quality counterpart of the fps ladder in
bench.py (reference role: the 30→60 fps transcode quality the wgpu
interpolator was built for but never measured, wgpu_interpolator.rs:216;
the clip generator + y4m path match the learned tier's held-out eval).

Modes: blend (the reference-shipped cross-fade), flow (full-res
Horn–Schunck + block-MC warp), flow_soft (production overlapped-tile soft
warp), flow_half (half-res flow).

Usage:
    python tools/interp_quality_eval.py [--cpu] [--height 1080 --width 1920]
        [--seeds 900 901 902] [--frames 5]
Run the 1080p table on the TPU (background, no timeout-kill).
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--seeds", type=int, nargs="+", default=[900, 901, 902])
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--factor", type=int, default=2,
                    help="frame-rate multiplier: 2 predicts the middle frame "
                         "(t=0.5); 3 predicts BOTH intermediates (t=1/3, 2/3) "
                         "from frames 3 apart — scores whether each mode (and "
                         "the t=0.5-trained refinement net) holds off-center")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nu_scaler_tpu.models.data import clip_through_video_path, render_clip
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops.metrics import psnr, ssim

    print(f"device {jax.devices()[0]}  {args.height}x{args.width}", flush=True)

    def predict(mode, a, b, t):
        if mode == "blend":
            return I.blend_only(a, b, t)
        if mode == "flow_soft":
            return I.soft_interp_fast(a, b, t)
        if mode == "flow_soft_ref":
            # bypass the serving-resolution policy (I.refine_serves) — this
            # tool MEASURES the policy, so it must score the net even below
            # REFINE_MIN_ROWS where production falls back to flow_soft
            mid = I.soft_interp_fast(a, b, t)
            return _refine_graph(a, b, mid)
        base = {"flow": 0, "flow_half": 1}[mode]
        flow = I.compute_flow_fast(a, b, base_level=base)
        return I.warp_blend_fast(a, b, flow, t)

    modes = ["blend", "flow", "flow_half", "flow_soft"]
    from nu_scaler_tpu.models.interp_refine import get_refine_graph, refine_available

    _refine_graph = None
    if refine_available() and args.height % 4 == 0 and args.width % 4 == 0:
        _refine_graph = jax.jit(get_refine_graph(args.height, args.width))
        modes.append("flow_soft_ref")
    scores: dict = {m: [] for m in modes}
    fac = args.factor
    for seed in args.seeds:
        clip = clip_through_video_path(
            render_clip(args.height, args.width, frames=args.frames, seed=seed)
        )
        for k in range(0, len(clip) - fac, fac):
            a = jnp.asarray(clip[k])
            b = jnp.asarray(clip[k + fac])
            for j in range(1, fac):
                truth = clip[k + j]
                t = j / fac
                for mode in scores:
                    mid = np.asarray(predict(mode, a, b, t))
                    scores[mode].append((psnr(mid, truth), ssim(mid, truth)))
        print(f"seed {seed}: done", flush=True)

    base_p = float(np.mean([p for p, _ in scores["blend"]]))
    base_s = float(np.mean([s for _, s in scores["blend"]]))
    for mode, vals in scores.items():
        p = float(np.mean([v[0] for v in vals]))
        s = float(np.mean([v[1] for v in vals]))
        print(
            f"{mode:10} {p:6.2f} dB  SSIM {s:.4f}   "
            f"(Δ vs blend {p - base_p:+.2f} dB / {s - base_s:+.4f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
