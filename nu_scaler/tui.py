"""Terminal UI — the reference's alternate-toolkit frontends rebuilt as a
curses shell over the SAME view-models as the Qt shell.

The reference ships the one screen set under three desktop toolkits
(`/root/reference/Nu_scale/src/ui/egui_ui.rs`, `iced_ui.rs`, `gtk_ui.rs` —
L8g) plus simplified launchers (`nu_scaler_py/nu_scaler/simple_gui.py`,
`modern_ui.py` — P6). Here the toolkit-breadth role is covered by three
frontends sharing `nu_scaler.viewmodels`: the PySide6 widget shell
(`nu_scaler/gui.py`), the web frontend (`nu_scaler_web/frontend.py`), and
this curses TUI — which also serves the "runs anywhere, zero deps" job the
reference's simple_gui launcher existed for.

Architecture matches gui.py: ALL state/logic lives in the view-models; this
module is (a) pure render functions (model → list of text lines) and a pure
key dispatcher, both tested headless, and (b) a thin curses driver loop.
"""

from __future__ import annotations

from typing import List, Optional

from nu_scaler.viewmodels import (
    ALGORITHMS,
    INTERP_MODES,
    QUALITIES,
    TECHNOLOGIES,
    MainWindowModel,
)

# luminance ramp for the ASCII live preview (dark → bright)
_RAMP = " .:-=+*#%@"


def _cycle(seq, cur):
    try:
        return seq[(seq.index(cur) + 1) % len(seq)]
    except ValueError:
        return seq[0]


def ascii_preview(frame: Optional[tuple], cols: int, rows: int) -> List[str]:
    """Render an (rgba_bytes, w, h) frame as `rows` lines of `cols` ASCII
    luminance cells (the QPixmap preview role, main.py:1117-1173). Pure
    Python — samples one pixel per cell, Rec.601 luma."""
    if not frame or cols <= 0 or rows <= 0:
        return ["(no frame)"]
    data, w, h = frame
    if w <= 0 or h <= 0 or len(data) < w * h * 4:
        return ["(bad frame)"]
    out = []
    for r in range(rows):
        y = min(h - 1, (r * h) // rows)
        line = []
        for c in range(cols):
            x = min(w - 1, (c * w) // cols)
            o = 4 * (y * w + x)
            lum = 0.299 * data[o] + 0.587 * data[o + 1] + 0.114 * data[o + 2]
            line.append(_RAMP[min(len(_RAMP) - 1, int(lum * len(_RAMP) / 256))])
        out.append("".join(line))
    return out


# ---------------------------------------------------------------------------
# Pure renderers: model → lines
# ---------------------------------------------------------------------------


def _header(model: MainWindowModel, width: int) -> List[str]:
    def row(trim: int) -> str:
        return "  ".join(
            (f"[{i + 1}:{n[:trim]}]" if n == model.current_screen else f" {i + 1}:{n[:trim]} ")
            for i, n in enumerate(model.SCREENS)
        )

    tabs = row(99)
    if len(tabs) > width:  # narrow terminal → compact tab labels, keep all visible
        tabs = row(3)
    return [tabs[:width], "-" * min(width, 78)]


def render_live(model: MainWindowModel, width: int = 78, height: int = 20) -> List[str]:
    lines = [f"live feed — {'RUNNING' if model.live.running else 'stopped'}  "
             f"(s start/stop, c snapshot, o overlay, d display mode)"]
    lines.append(f"display: {model.live.display_mode.value}")
    if model.live.overlay_visible:
        lines += [f"  {ln}" for ln in model.live.overlay_lines()]
    prev_rows = max(1, height - len(lines) - 1)
    lines.append("")
    lines += ascii_preview(model.live.latest_frame, min(width, 78), prev_rows)
    return lines


def render_settings(model: MainWindowModel, width: int = 78) -> List[str]:
    s = model.settings
    it = model.interp_tuning
    return [
        "settings  (a/Q/t cycle, +/- scale, f/F fps, i interp, m mode, w save)",
        f"  technology : {s.technology}",
        f"  quality    : {s.quality}",
        f"  algorithm  : {s.algorithm}",
        f"  scale      : {s.scale:.2f}",
        f"  fps        : {s.fps}",
        f"  source     : {s.source}",
        f"  interp     : {'on' if s.interpolation else 'off'} ({s.interpolation_mode})",
        f"  tuning     : levels={it.levels} coarse={it.coarse_iters} "
        f"refine={it.refine_iters} wg={it.workgroup_preset}",
        f"  dirty      : {'yes' if s.dirty else 'no'}",
    ]


def render_preview(model: MainWindowModel, width: int = 78, height: int = 20) -> List[str]:
    p = model.preview
    lines = ["preview  (paired original/processed panes; load via --preview FILE)"]
    if p.error:
        lines.append(f"  error: {p.error}")
    if p.original and p.processed:
        _, ow, oh = p.original
        _, pw, ph = p.processed
        lines.append(f"  {p.file_path}: {ow}x{oh} → {pw}x{ph}")
        half = max(4, (height - len(lines) - 2) // 2)
        cols = min(width, 78)
        lines.append("  original:")
        lines += ascii_preview(p.original, cols, half)
        lines.append("  processed:")
        lines += ascii_preview(p.processed, cols, half)
    elif not p.error:
        lines.append("  (no file loaded)")
    return lines


def render_debug(model: MainWindowModel, width: int = 78, height: int = 20) -> List[str]:
    head = [f"debug console  (x clear, L min-level={model.debug.min_level})"]
    tail = model.debug.lines()[-(height - len(head)) :]
    return head + [ln[:width] for ln in tail]


def render_advanced(model: MainWindowModel, width: int = 78) -> List[str]:
    a = model.advanced
    lines = [
        "advanced  (r refresh VRAM, g strategy, A adaptive)",
        f"  strategy   : {a.memory_strategy}",
        f"  adaptive   : {'on' if a.adaptive_quality else 'off'}",
        f"  pool size  : {a.buffer_pool_size}   threads: {a.thread_count}",
    ]
    if a.last_stats is not None:
        lines.append("  " + a.vram_label())
    return lines


def render_benchmark(model: MainWindowModel, width: int = 78) -> List[str]:
    st = model.benchmark.state
    lines = [
        "benchmark  (b single, C comparison, e export csv)",
        f"  state: {'running' if st.running else (st.progress or 'idle')}",
    ]
    if st.error:
        lines.append(f"  error: {st.error}")
    rows = model.benchmark.rows()
    if rows:
        lines.append(f"  {'tech':10} {'quality':12} {'fps':>8} {'ms':>9}")
        for r in rows:
            lines.append(
                f"  {r['technology']:10} {r['quality']:12} "
                f"{r['fps']:8.1f} {r['avg_frame_time_ms']:9.3f}"
            )
    return lines


def render_accessibility(model: MainWindowModel, width: int = 78) -> List[str]:
    a = model.accessibility
    return [
        "accessibility  (T theme, ]/[ font scale, M reduced motion, w save)",
        f"  theme          : {a.theme}",
        f"  font scale     : {a.font_scale:.2f}",
        f"  reduced motion : {'on' if a.reduced_motion else 'off'}",
    ]


_RENDERERS = {
    "live": render_live,
    "settings": render_settings,
    "preview": render_preview,
    "debug": render_debug,
    "advanced": render_advanced,
    "benchmark": render_benchmark,
    "accessibility": render_accessibility,
}


def render(model: MainWindowModel, width: int = 78, height: int = 22) -> List[str]:
    """Full frame: header + current screen, clipped to width."""
    fn = _RENDERERS[model.current_screen]
    try:
        body = fn(model, width=width, height=height - 3)  # type: ignore[call-arg]
    except TypeError:
        body = fn(model, width=width)  # type: ignore[call-arg]
    return [ln[:width] for ln in _header(model, width) + body]


# ---------------------------------------------------------------------------
# Pure key dispatch
# ---------------------------------------------------------------------------


def handle_key(model: MainWindowModel, key: str) -> bool:
    """Apply one keypress to the model. Returns False when the app should
    quit. Number keys navigate; the rest act on the current screen (global
    hotkey-parity keys s/c/o work everywhere, HotkeyManager defaults)."""
    s = model.settings
    if key == "q":
        model.request_quit()
        return False
    if key.isdigit() and 1 <= int(key) <= len(model.SCREENS):
        model.navigate(model.SCREENS[int(key) - 1])
        return True
    # global hotkey parity (ui/hotkeys.rs defaults)
    if key == "s":
        model.live.toggle_capture()
        return True
    if key == "c":
        model.live.capture_frame()
        return True
    if key == "o":
        model.live.toggle_overlay()
        return True

    scr = model.current_screen
    if scr == "live":
        if key == "d":
            model.live.cycle_display_mode()
    elif scr == "settings":
        if key == "a":
            s.set_algorithm(_cycle(ALGORITHMS, s.algorithm))
        elif key == "Q":
            s.set_quality(_cycle(QUALITIES, s.quality))
        elif key == "t":
            s.set_technology(_cycle(TECHNOLOGIES, s.technology))
        elif key == "+":
            s.set_scale(min(4.0, s.scale + 0.25))
        elif key == "-":
            s.set_scale(max(1.0, s.scale - 0.25))
        elif key == "f":
            s.set_fps(s.fps - 5)
        elif key == "F":
            s.set_fps(s.fps + 5)
        elif key == "i":
            s.set_interpolation(not s.interpolation)
        elif key == "m":
            model.interp_tuning.set_mode(_cycle(INTERP_MODES, s.interpolation_mode))
            model.interp_tuning.apply()
        elif key == "w":
            s.save_profile()
    elif scr == "debug":
        if key == "x":
            model.debug.clear()
        elif key == "L":
            import logging

            order = [logging.DEBUG, logging.INFO, logging.WARNING, logging.ERROR]
            model.debug.set_min_level(_cycle(order, model.debug.min_level))
    elif scr == "advanced":
        if key == "r":
            model.advanced.refresh()
        elif key == "g":
            model.advanced.set_memory_strategy(
                _cycle(model.advanced.STRATEGIES, model.advanced.memory_strategy)
            )
        elif key == "A":
            model.advanced.set_adaptive_quality(not model.advanced.adaptive_quality)
    elif scr == "benchmark":
        if key == "b" and not model.benchmark.state.running:
            model.benchmark.start(
                "single",
                technology=s.technology,
                quality=s.quality,
                input_width=320,
                input_height=240,
                scale_factor=s.scale,
                frame_count=5,
            )
        elif key == "C" and not model.benchmark.state.running:
            model.benchmark.start(
                "comparison",
                input_width=160,
                input_height=120,
                scale_factor=2.0,
                frame_count=2,
            )
        elif key == "e" and model.benchmark.state.results:
            import os
            import tempfile

            fd, path = tempfile.mkstemp(prefix="nu_scaler_bench_", suffix=".csv")
            os.close(fd)
            model.benchmark.export_csv(path)
    elif scr == "accessibility":
        a = model.accessibility
        if key == "T":
            a.set_theme(_cycle(a.THEMES, a.theme))
        elif key == "]":
            a.set_font_scale(a.font_scale + 0.1)
        elif key == "[":
            a.set_font_scale(a.font_scale - 0.1)
        elif key == "M":
            a.set_reduced_motion(not a.reduced_motion)
        elif key == "w":
            a.save()
    return True


# ---------------------------------------------------------------------------
# Curses driver (thin)
# ---------------------------------------------------------------------------


def run_curses(model: MainWindowModel, tick_hz: float = 10.0) -> None:
    """The event loop: nodelay getch + periodic re-render (the QTimer role,
    main.py:302-304). Kept minimal — everything it calls is tested above."""
    import curses

    def _loop(scr):
        curses.curs_set(0)
        scr.nodelay(True)
        scr.timeout(int(1000 / tick_hz))
        while not model.quit_requested:
            h, w = scr.getmaxyx()
            scr.erase()
            for i, line in enumerate(render(model, width=w - 1, height=h)[: h - 1]):
                scr.addstr(i, 0, line)
            scr.refresh()
            ch = scr.getch()
            if ch == -1:
                continue
            if not handle_key(model, chr(ch) if 0 < ch < 256 else ""):
                break

    try:
        curses.wrapper(_loop)
    finally:
        model.shutdown()


def main(argv: Optional[List[str]] = None) -> int:
    """`nu-scaler-tui` console script."""
    import argparse

    ap = argparse.ArgumentParser(description="NU Scaler terminal UI")
    ap.add_argument("--source", default=None, help="capture source override")
    ap.add_argument("--preview", default=None, help="load an image into the preview screen")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    model = MainWindowModel()
    if args.source:
        model.settings.set_source(args.source)
    if args.preview:
        model.preview.load_file(args.preview)
        model.navigate("preview")
    run_curses(model)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
