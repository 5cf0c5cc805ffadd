"""PySide6 GUI — the reference's multi-screen app (`nu_scaler_py/nu_scaler/
main.py`: LiveFeedScreen :278-355, SettingsScreen, DebugScreen,
AdvancedScreen, BenchmarkScreen, UIAccessibilityScreen, MainWindow :1956+).

All screen STATE AND LOGIC lives in `nu_scaler.viewmodels` (Qt-free, tested
headless — PySide6 is absent in the build environment); this module is the
widget layer: each screen class binds one view-model to widgets and timers.
`main()` degrades to a clear headless hint when PySide6 is missing.
"""

from __future__ import annotations

import sys

from nu_scaler.viewmodels import DisplayMode, MainWindowModel


def build_app(model: MainWindowModel | None = None):
    """Construct (app, window). Split from main() so tests with a Qt-enabled
    environment can drive the widget layer directly."""
    from PySide6.QtCore import Qt, QTimer
    from PySide6.QtGui import QImage, QPixmap
    from PySide6.QtWidgets import (
        QApplication,
        QCheckBox,
        QComboBox,
        QDialog,
        QDoubleSpinBox,
        QFileDialog,
        QFormLayout,
        QHBoxLayout,
        QLabel,
        QMainWindow,
        QPlainTextEdit,
        QPushButton,
        QSpinBox,
        QTableWidget,
        QTableWidgetItem,
        QTabWidget,
        QVBoxLayout,
        QWidget,
    )

    from nu_scaler.viewmodels import ALGORITHMS, INTERP_MODES, QUALITIES, SOURCES, TECHNOLOGIES

    m = model or MainWindowModel()

    class LiveScreen(QWidget):
        """main.py:278-355 + display modes :610-767."""

        def __init__(self):
            super().__init__()
            lay = QVBoxLayout(self)
            self.preview = QLabel("no signal")
            self.preview.setMinimumSize(640, 360)
            self.preview.setAlignment(Qt.AlignCenter)
            lay.addWidget(self.preview)
            row = QHBoxLayout()
            self.btn = QPushButton("Start")
            self.btn.clicked.connect(self.toggle)
            self.mode = QComboBox()
            self.mode.addItems([d.value for d in DisplayMode])
            self.mode.currentTextChanged.connect(m.live.set_display_mode)
            self.snap = QPushButton("Capture frame")
            self.snap.clicked.connect(m.live.capture_frame)
            self.ovl = QCheckBox("overlay")
            self.ovl.setChecked(True)
            self.ovl.toggled.connect(lambda _on: m.live.toggle_overlay())
            for w in (self.btn, self.mode, self.snap, self.ovl):
                row.addWidget(w)
            lay.addLayout(row)
            self.overlay = QLabel("")
            lay.addWidget(self.overlay)
            self.timer = QTimer(self)
            self.timer.setInterval(33)
            self.timer.timeout.connect(self.refresh)

        def toggle(self):
            running = m.live.toggle_capture()
            self.btn.setText("Stop" if running else "Start")
            (self.timer.start if running else self.timer.stop)()

        def refresh(self):
            fr = m.live.latest_frame
            if fr is not None:
                data, w, h = fr
                img = QImage(data, w, h, w * 4, QImage.Format_RGBA8888)
                self.preview.setPixmap(
                    QPixmap.fromImage(img).scaled(
                        self.preview.size(), Qt.KeepAspectRatio, Qt.SmoothTransformation
                    )
                )
            self.overlay.setText(
                " | ".join(m.live.overlay_lines()) if m.live.overlay_visible else ""
            )

    class SettingsScreen(QWidget):
        def __init__(self):
            super().__init__()
            form = QFormLayout(self)
            s = m.settings

            def combo(items, current, setter):
                c = QComboBox()
                c.addItems(items)
                c.setCurrentText(current)
                c.currentTextChanged.connect(setter)
                return c

            form.addRow("Source", combo(SOURCES, s.source.split(":")[0], s.set_source))
            form.addRow("Technology", combo(TECHNOLOGIES, s.technology, s.set_technology))
            form.addRow("Quality", combo(QUALITIES, s.quality, s.set_quality))
            form.addRow("Algorithm", combo(ALGORITHMS, s.algorithm, s.set_algorithm))
            scale = QDoubleSpinBox()
            scale.setRange(1.0, 4.0)
            scale.setSingleStep(0.25)
            scale.setValue(s.scale)
            scale.valueChanged.connect(s.set_scale)
            form.addRow("Scale", scale)
            fps = QSpinBox()
            fps.setRange(1, 240)
            fps.setValue(s.fps)
            fps.valueChanged.connect(s.set_fps)
            form.addRow("Target FPS", fps)
            interp = QCheckBox()
            interp.setChecked(s.interpolation)
            interp.toggled.connect(s.set_interpolation)
            form.addRow("Interpolation", interp)
            imode = combo(INTERP_MODES, s.interpolation_mode, lambda v: s.set_interpolation(s.interpolation, v))
            form.addRow("Interp mode", imode)
            save = QPushButton("Save profile")
            save.clicked.connect(lambda: s.save_profile())
            form.addRow(save)

    class PreviewPane(QLabel):
        """Drag-drop/file-open preview pane (modern_gui.py:553-1020)."""

        def __init__(self, title, on_path):
            super().__init__(f"{title}\n(drop an image here)")
            self.setAcceptDrops(True)
            self.setMinimumSize(320, 240)
            self.setAlignment(Qt.AlignCenter)
            self._on_path = on_path

        def dragEnterEvent(self, event):  # noqa: N802 — Qt naming
            if event.mimeData().hasUrls():
                event.acceptProposedAction()

        def dropEvent(self, event):  # noqa: N802
            urls = event.mimeData().urls()
            if urls:
                self._on_path(urls[0].toLocalFile())
                event.acceptProposedAction()

        def show_frame(self, frame):
            if frame is None:
                return
            data, w, h = frame
            img = QImage(data, w, h, w * 4, QImage.Format_RGBA8888)
            self.setPixmap(
                QPixmap.fromImage(img).scaled(
                    self.size(), Qt.KeepAspectRatio, Qt.SmoothTransformation
                )
            )

    class PreviewScreen(QWidget):
        """Original/processed pair + interpolation dialog launcher — the
        modern_gui PreviewPane + InterpolationDialog flow consolidated into
        the main shell."""

        def __init__(self):
            super().__init__()
            lay = QVBoxLayout(self)
            panes = QHBoxLayout()
            self.original = PreviewPane("Original", self.load)
            self.processed = PreviewPane("Processed", self.load)
            panes.addWidget(self.original)
            panes.addWidget(self.processed)
            lay.addLayout(panes)
            row = QHBoxLayout()
            open_btn = QPushButton("Open…")
            open_btn.clicked.connect(self.open_dialog)
            interp_btn = QPushButton("Interpolation…")
            interp_btn.clicked.connect(self.open_interp_dialog)
            reset = QPushButton("Reset")
            reset.clicked.connect(self.reset)
            for wdg in (open_btn, interp_btn, reset):
                row.addWidget(wdg)
            lay.addLayout(row)
            self.status = QLabel("")
            lay.addWidget(self.status)

        def load(self, path):
            if m.preview.load_file(path):
                self.original.show_frame(m.preview.original)
                self.processed.show_frame(m.preview.processed)
                self.status.setText(path)
            else:
                self.status.setText(m.preview.error or "load failed")

        def open_dialog(self):
            path, _ = QFileDialog.getOpenFileName(
                self, "Open Image", "",
                "Images (*.png *.jpg *.jpeg *.bmp *.webp *.gif)",
            )
            if path:
                self.load(path)

        def reset(self):
            m.preview.reset()
            self.original.setText("Original\n(drop an image here)")
            self.processed.setText("Processed")
            self.status.setText("")

        def open_interp_dialog(self):
            dlg = InterpolationDialog(self)
            dlg.exec()

    class InterpolationDialog(QDialog):
        """Advanced interpolation settings (modern_gui.py:1572-2000)."""

        def __init__(self, parent=None):
            super().__init__(parent)
            self.setWindowTitle("Advanced Interpolation Settings")
            t = m.interp_tuning
            form = QFormLayout(self)
            self.mode = QComboBox()
            self.mode.addItems(INTERP_MODES)
            self.mode.setCurrentText(t.mode)
            self.mode.currentTextChanged.connect(t.set_mode)
            form.addRow("Mode", self.mode)
            levels = QSpinBox()
            levels.setRange(1, 6)
            levels.setValue(t.levels)
            levels.valueChanged.connect(t.set_levels)
            form.addRow("Pyramid levels", levels)
            coarse = QSpinBox()
            coarse.setRange(1, 128)
            coarse.setValue(t.coarse_iters)
            coarse.valueChanged.connect(t.set_coarse_iters)
            form.addRow("Coarse iterations", coarse)
            refine = QSpinBox()
            refine.setRange(0, 64)
            refine.setValue(t.refine_iters)
            refine.valueChanged.connect(t.set_refine_iters)
            form.addRow("Refine iterations", refine)
            preset = QComboBox()
            preset.addItems(t.PRESETS)
            preset.setCurrentText(t.workgroup_preset)
            preset.currentTextChanged.connect(t.set_workgroup_preset)
            form.addRow("Warp workgroup", preset)
            apply_btn = QPushButton("Apply")
            apply_btn.clicked.connect(lambda: (t.apply(), self.accept()))
            cancel = QPushButton("Cancel")
            cancel.clicked.connect(self.reject)
            row = QHBoxLayout()
            row.addWidget(apply_btn)
            row.addWidget(cancel)
            form.addRow(row)

    class DebugScreen(QWidget):
        """Log console (main.py:1464-1475)."""

        def __init__(self):
            super().__init__()
            lay = QVBoxLayout(self)
            self.console = QPlainTextEdit()
            self.console.setReadOnly(True)
            lay.addWidget(self.console)
            row = QHBoxLayout()
            self.level = QComboBox()
            self.level.addItems(["DEBUG", "INFO", "WARNING", "ERROR"])
            self.level.setCurrentText("INFO")
            self.level.currentTextChanged.connect(
                lambda t: m.debug.set_min_level(__import__("logging").getLevelName(t))
            )
            clear = QPushButton("Clear")
            clear.clicked.connect(lambda: (m.debug.clear(), self.console.clear()))
            save = QPushButton("Save…")
            save.clicked.connect(self.save)
            for w in (self.level, clear, save):
                row.addWidget(w)
            lay.addLayout(row)
            self.timer = QTimer(self)
            self.timer.setInterval(500)
            self.timer.timeout.connect(self.refresh)
            self.timer.start()

        def refresh(self):
            self.console.setPlainText("\n".join(m.debug.lines()))

        def save(self):
            path, _ = QFileDialog.getSaveFileName(self, "Save log", "nu_scaler.log")
            if path:
                m.debug.save(path)

    class AdvancedScreen(QWidget):
        def __init__(self):
            super().__init__()
            form = QFormLayout(self)
            a = m.advanced
            strat = QComboBox()
            strat.addItems(a.STRATEGIES)
            strat.setCurrentText(a.memory_strategy)
            strat.currentTextChanged.connect(a.set_memory_strategy)
            form.addRow("Memory strategy", strat)
            adq = QCheckBox()
            adq.setChecked(a.adaptive_quality)
            adq.toggled.connect(a.set_adaptive_quality)
            form.addRow("Adaptive quality", adq)
            pool = QSpinBox()
            pool.setRange(1, 16)
            pool.setValue(a.buffer_pool_size)
            pool.valueChanged.connect(a.set_buffer_pool_size)
            form.addRow("Buffer pool", pool)
            thr = QSpinBox()
            thr.setRange(1, 64)
            thr.setValue(a.thread_count)
            thr.valueChanged.connect(a.set_thread_count)
            form.addRow("Threads", thr)
            force = QPushButton("Force GPU activation")
            force.clicked.connect(a.force_activation)
            form.addRow(force)
            clean = QPushButton("Cleanup memory")
            clean.clicked.connect(a.cleanup_memory)
            form.addRow(clean)
            self.vram = QLabel("")
            form.addRow("VRAM", self.vram)
            self.timer = QTimer(self)
            self.timer.setInterval(2000)  # 2 s VRAM poll (main.py:863-886)
            self.timer.timeout.connect(lambda: self.vram.setText(m.advanced.vram_label()))
            self.timer.start()

    class BenchmarkScreen(QWidget):
        def __init__(self):
            super().__init__()
            lay = QVBoxLayout(self)
            row = QHBoxLayout()
            single = QPushButton("Run single")
            single.clicked.connect(lambda: m.benchmark.start("single"))
            compare = QPushButton("Run comparison")
            compare.clicked.connect(lambda: m.benchmark.start("compare"))
            export = QPushButton("Export CSV…")
            export.clicked.connect(self.export)
            for w in (single, compare, export):
                row.addWidget(w)
            lay.addLayout(row)
            self.status = QLabel("")
            lay.addWidget(self.status)
            self.table = QTableWidget(0, 4)
            self.table.setHorizontalHeaderLabels(["tech", "quality", "fps", "ms"])
            lay.addWidget(self.table)
            self.timer = QTimer(self)
            self.timer.setInterval(500)
            self.timer.timeout.connect(self.refresh)
            self.timer.start()

        def refresh(self):
            st = m.benchmark.state
            self.status.setText(st.error or st.progress)
            rows = m.benchmark.rows()
            self.table.setRowCount(len(rows))
            for i, r in enumerate(rows):
                for j, key in enumerate(["technology", "quality", "fps", "avg_frame_time_ms"]):
                    self.table.setItem(i, j, QTableWidgetItem(str(r[key])))

        def export(self):
            path, _ = QFileDialog.getSaveFileName(self, "Export CSV", "benchmark.csv")
            if path:
                m.benchmark.export_csv(path)

    class AccessibilityScreen(QWidget):
        def __init__(self):
            super().__init__()
            form = QFormLayout(self)
            a = m.accessibility
            font = QDoubleSpinBox()
            font.setRange(0.5, 3.0)
            font.setSingleStep(0.1)
            font.setValue(a.font_scale)
            font.valueChanged.connect(lambda v: (a.set_font_scale(v), a.save()))
            form.addRow("Font scale", font)
            theme = QComboBox()
            theme.addItems(a.THEMES)
            theme.setCurrentText(a.theme)
            theme.currentTextChanged.connect(lambda t: (a.set_theme(t), a.save()))
            form.addRow("Theme", theme)
            rm = QCheckBox()
            rm.setChecked(a.reduced_motion)
            rm.toggled.connect(lambda on: (a.set_reduced_motion(on), a.save()))
            form.addRow("Reduced motion", rm)

    class MainWindow(QMainWindow):
        def __init__(self):
            super().__init__()
            self.setWindowTitle("NU Scaler (TPU)")
            tabs = QTabWidget()
            tabs.addTab(LiveScreen(), "Live")
            tabs.addTab(SettingsScreen(), "Settings")
            tabs.addTab(PreviewScreen(), "Preview")
            tabs.addTab(DebugScreen(), "Debug")
            tabs.addTab(AdvancedScreen(), "Advanced")
            tabs.addTab(BenchmarkScreen(), "Benchmark")
            tabs.addTab(AccessibilityScreen(), "Accessibility")
            tabs.currentChanged.connect(
                lambda i: m.navigate(MainWindowModel.SCREENS[i])
            )
            self.setCentralWidget(tabs)
            m.hotkeys.start()  # OS listener when a backend exists
            self.quit_timer = QTimer(self)
            self.quit_timer.setInterval(200)
            self.quit_timer.timeout.connect(self._poll_quit)
            self.quit_timer.start()

        def _poll_quit(self):
            if m.quit_requested:
                self.close()

        def closeEvent(self, event):  # noqa: N802 — Qt naming
            m.shutdown()
            event.accept()

    app = QApplication.instance() or QApplication(sys.argv)
    return app, MainWindow()


def main() -> int:
    try:
        import PySide6  # noqa: F401
    except ImportError:
        print(
            "PySide6 is not installed. Run the headless pipeline instead:\n"
            "    python -m nu_scaler.headless --help",
            file=sys.stderr,
        )
        return 2
    app, win = build_app()
    win.show()
    return app.exec()


if __name__ == "__main__":
    sys.exit(main())
