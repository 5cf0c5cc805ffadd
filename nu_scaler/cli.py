"""`nu-scaler` CLI — flag parity with the legacy clap entry
(`/root/reference/Nu_scale/src/main.rs:7-216`): subcommands `fullscreen`
(borderless upscale loop: capture → upscale → present with adaptive frame
skipping + single-instance lock) and `cli` (headless one-shot), plus `bench`
and `gui` passthroughs to the dedicated apps.
"""

from __future__ import annotations

import argparse
import sys
import time


def _add_pipeline_flags(p: argparse.ArgumentParser) -> None:
    # main.rs:18-78 flag set
    p.add_argument("--source", default="fullscreen",
                   help="fullscreen | window:<title> | region:x,y,w,h | synthetic")
    p.add_argument("--tech", default="wgpu",
                   choices=["wgpu", "fsr", "dlss", "fallback"])
    p.add_argument("--quality", default="quality",
                   choices=["ultra", "quality", "balanced", "performance"])
    p.add_argument("--fps", type=int, default=60)
    p.add_argument("--algorithm", default="lanczos3")
    p.add_argument("--scale", type=float, default=2.0)
    p.add_argument("--interpolate", action="store_true")
    p.add_argument("--interp-mode", default="blend",
                   choices=["blend", "flow", "flow_soft", "flow_soft_ref"])
    p.add_argument("--cpu", action="store_true", help="force the CPU backend "
                   "(the site config pins JAX_PLATFORMS=axon)")


def cmd_fullscreen(args) -> int:
    """start_borderless_upscale role (Nu_scale/src/lib.rs:85-227): capture
    thread → frame buffer → presenter with adaptive frame skipping."""
    from nu_scaler.live import LiveSession
    from nu_scaler.present import FullscreenPresenter

    blit_count = [0]

    def blit(data: bytes, w: int, h: int) -> None:
        blit_count[0] += 1

    presenter = FullscreenPresenter(
        blit=blit,
        target_fps=args.fps,
        enable_frame_skipping=True,
        single_instance=True,
    )
    session = LiveSession(
        scale=args.scale,
        algorithm=args.algorithm,
        quality=args.quality,
        technology=args.tech,
        interpolation=args.interpolate,
        interpolation_mode=args.interp_mode,
        sink=presenter.submit,
        fps=args.fps,
    )
    presenter.start()
    session.start()
    try:
        if args.seconds > 0:
            time.sleep(args.seconds)
        else:  # run until interrupted
            while True:
                time.sleep(1.0)
    except KeyboardInterrupt:
        pass
    finally:
        session.stop()
        presenter.stop()
    print({"session": session.stats(), "presenter": presenter.overlay_lines()})
    return 0 if presenter.stats.frames_presented > 0 else 1


def cmd_cli(args) -> int:
    from nu_scaler import headless

    argv = [
        "--seconds", str(args.seconds if args.seconds > 0 else 5),
        "--scale", str(args.scale),
        "--quality", args.quality,
        "--tech", args.tech,
        "--algorithm", args.algorithm,
        "--source", args.source,
    ]
    if args.interpolate:
        argv += ["--interpolate", "--interp-mode", args.interp_mode]
    return headless.main(argv)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nu-scaler", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    fs = sub.add_parser("fullscreen", help="borderless upscale loop")
    _add_pipeline_flags(fs)
    fs.add_argument("--seconds", type=float, default=0.0,
                    help="run duration; 0 = until Ctrl-C")
    fs.set_defaults(fn=cmd_fullscreen)

    cl = sub.add_parser("cli", help="headless one-shot run")
    _add_pipeline_flags(cl)
    cl.add_argument("--seconds", type=float, default=5.0)
    cl.set_defaults(fn=cmd_cli)

    be = sub.add_parser("bench", help="benchmark app passthrough")
    be.add_argument("rest", nargs=argparse.REMAINDER)
    be.set_defaults(fn=lambda a: __import__("nu_scaler.benchmark_app", fromlist=["main"]).main(a.rest))

    gu = sub.add_parser("gui", help="PySide6 GUI")
    gu.set_defaults(fn=lambda a: __import__("nu_scaler.gui", fromlist=["main"]).main())

    tu = sub.add_parser("tui", help="curses terminal UI")
    tu.add_argument("rest", nargs=argparse.REMAINDER)
    tu.set_defaults(fn=lambda a: __import__("nu_scaler.tui", fromlist=["main"]).main(a.rest))

    tr = sub.add_parser("transcode",
                        help="batch Y4M→Y4M upscale / frame-rate multiply")
    tr.add_argument("rest", nargs=argparse.REMAINDER)
    tr.set_defaults(fn=lambda a: __import__(
        "nu_scaler.transcode", fromlist=["main"]).main(a.rest))

    args = p.parse_args(argv)
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
