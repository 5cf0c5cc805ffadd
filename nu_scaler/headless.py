"""Headless live-pipeline CLI — run capture→(interp)→upscale without a GUI,
optionally writing output frames as PNGs.

    python -m nu_scaler.headless --seconds 5 --scale 2 --algorithm lanczos3 \\
        --interpolate --out-dir /tmp/frames
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nu-scaler-headless", description=__doc__)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--scale", type=float, default=2.0)
    p.add_argument("--quality", default="quality")
    p.add_argument("--tech", default="wgpu", choices=["wgpu", "fsr", "dlss", "fallback"])
    p.add_argument("--algorithm", default="lanczos3")
    p.add_argument("--interpolate", action="store_true")
    p.add_argument("--interp-mode", default="blend", choices=["blend", "flow", "flow_soft", "flow_soft_ref"])
    p.add_argument("--source", default="fullscreen")
    p.add_argument("--out-dir", default=None, help="write output frames as PNGs")
    p.add_argument("--max-saved", type=int, default=30)
    args = p.parse_args(argv)

    saved = [0]

    def sink(data: bytes, w: int, h: int) -> None:
        if args.out_dir and saved[0] < args.max_saved:
            from PIL import Image

            os.makedirs(args.out_dir, exist_ok=True)
            img = Image.frombytes("RGBA", (w, h), data)
            img.save(os.path.join(args.out_dir, f"frame_{saved[0]:05d}.png"))
            saved[0] += 1

    from nu_scaler.live import LiveSession

    session = LiveSession(
        scale=args.scale,
        algorithm=args.algorithm,
        quality=args.quality,
        technology=args.tech,
        interpolation=args.interpolate,
        interpolation_mode=args.interp_mode,
        sink=sink,
    ).start()
    try:
        time.sleep(args.seconds)
    finally:
        session.stop()
    stats = session.stats()
    print(stats)
    return 0 if stats["frames_out"] > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
