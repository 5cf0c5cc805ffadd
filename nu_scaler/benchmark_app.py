"""Benchmark CLI — role of `nu_scaler_py/benchmark_app.py` (P4).

Modes:
    single   one tech/quality configuration
    compare  full {tech} × {quality} grid
    batch    resolution sweep for one configuration

Example:
    python -m nu_scaler.benchmark_app single --tech wgpu --quality quality \\
        --width 1920 --height 1080 --scale 2.0 --frames 100 --save out.csv
"""

from __future__ import annotations

import argparse
import sys

from nu_scaler import benchmark as bm

RESOLUTIONS = {
    "hd": (1280, 720),
    "fhd": (1920, 1080),
    "qhd": (2560, 1440),
    "4k": (3840, 2160),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="nu-scaler-bench", description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)

    def common(sp):
        sp.add_argument("--width", type=int, default=1920)
        sp.add_argument("--height", type=int, default=1080)
        sp.add_argument("--resolution", choices=RESOLUTIONS, default=None)
        sp.add_argument("--scale", type=float, default=2.0)
        sp.add_argument("--frames", type=int, default=100)
        sp.add_argument("--save", type=str, default=None, help="CSV output path")
        sp.add_argument("--plot", type=str, default=None, help="PNG chart path")

    s = sub.add_parser("single", help="benchmark one configuration")
    s.add_argument("--tech", default="auto", choices=["auto", "fsr", "dlss", "wgpu", "fallback"])
    s.add_argument("--quality", default="balanced", choices=["ultra", "quality", "balanced", "performance"])
    common(s)

    c = sub.add_parser("compare", help="full tech x quality grid")
    common(c)

    b = sub.add_parser("batch", help="resolution sweep")
    b.add_argument("--tech", default="wgpu")
    b.add_argument("--quality", default="quality")
    b.add_argument("--sweep", nargs="+", default=["hd", "fhd", "qhd"], choices=list(RESOLUTIONS))
    common(b)

    st = sub.add_parser("stress", help="parallel stress test (gpu_stress_test role)")
    st.add_argument("--threads", type=int, default=4)
    st.add_argument("--tech", default="wgpu")
    st.add_argument("--quality", default="balanced")
    common(st)
    return p


def run_stress(args) -> list:
    """N worker threads hammering independent upscalers concurrently while a
    monitor samples memory — the reference's `gpu_stress_test.py` role."""
    import threading

    from nu_scaler.gpu_optimizer import GpuMonitor

    mon = GpuMonitor(interval=1.0, printer=lambda s: None).start()
    results = [None] * args.threads

    def work(i):
        results[i] = bm.run_benchmark(
            args.tech, args.quality, args.width, args.height, args.scale, args.frames
        )

    threads = [threading.Thread(target=work, args=(i,)) for i in range(args.threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mon.stop()
    results = [r for r in results if r is not None]
    total_fps = sum(r.fps for r in results)
    print(f"stress: {len(results)}/{args.threads} workers ok, aggregate {total_fps:.1f} fps, "
          f"peak mem {max(mon.samples, default=0):.1f}%")
    return results


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.resolution:
        args.width, args.height = RESOLUTIONS[args.resolution]

    if args.mode == "single":
        r = bm.run_benchmark(args.tech, args.quality, args.width, args.height, args.scale, args.frames)
        if r is None:
            return 1
        print(r)
        results = [r]
    elif args.mode == "compare":
        results = bm.run_comparison_benchmark(args.width, args.height, args.scale, args.frames)
        for r in results:
            print(r)
    elif args.mode == "stress":
        results = run_stress(args)
    else:  # batch
        results = []
        for name in args.sweep:
            w, h = RESOLUTIONS[name]
            r = bm.run_benchmark(args.tech, args.quality, w, h, args.scale, args.frames)
            if r:
                print(r)
                results.append(r)

    if args.save and results:
        bm.export_csv(results, args.save)
        print(f"saved CSV: {args.save}")
    if args.plot and results:
        bm.plot_results(results, args.plot)
        print(f"saved plot: {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
