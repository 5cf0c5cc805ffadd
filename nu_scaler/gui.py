"""PySide6 GUI entry point — role of `nu_scaler_py/nu_scaler/main.py` (P1).

The engine itself is UI-toolkit-free (`nu_scaler.live.LiveSession`,
`nu_scaler.core.Engine`); this module provides a minimal Qt shell around it:
live preview, settings (source/quality/algorithm/scale/interpolation),
overlay stats, profiles. PySide6 is not installed in the build environment,
so the widget code is imported lazily and `main()` degrades to a clear error
+ headless fallback hint.
"""

from __future__ import annotations

import sys


def main() -> int:
    try:
        from PySide6.QtCore import Qt, QTimer  # noqa: F401
        from PySide6.QtGui import QImage, QPixmap
        from PySide6.QtWidgets import (
            QApplication,
            QComboBox,
            QDoubleSpinBox,
            QCheckBox,
            QHBoxLayout,
            QLabel,
            QMainWindow,
            QPushButton,
            QVBoxLayout,
            QWidget,
        )
    except ImportError:
        print(
            "PySide6 is not installed. Run the headless pipeline instead:\n"
            "    python -m nu_scaler.headless --help",
            file=sys.stderr,
        )
        return 2

    from nu_scaler.core import Engine

    class MainWindow(QMainWindow):
        def __init__(self) -> None:
            super().__init__()
            self.setWindowTitle("NU Scaler (TPU)")
            self.engine: Engine | None = None
            self._latest = None

            central = QWidget()
            layout = QVBoxLayout(central)
            self.preview = QLabel("no signal")
            self.preview.setMinimumSize(640, 360)
            self.preview.setAlignment(Qt.AlignCenter)
            layout.addWidget(self.preview)

            controls = QHBoxLayout()
            self.quality = QComboBox()
            self.quality.addItems(["ultra", "quality", "balanced", "performance"])
            self.algorithm = QComboBox()
            self.algorithm.addItems(
                ["nearest", "bilinear", "bicubic", "lanczos2", "lanczos3", "mitchell"]
            )
            self.scale = QDoubleSpinBox()
            self.scale.setRange(1.0, 4.0)
            self.scale.setValue(2.0)
            self.interp = QCheckBox("interpolate")
            self.button = QPushButton("Start")
            self.button.clicked.connect(self.toggle)
            for wdg in (self.quality, self.algorithm, self.scale, self.interp, self.button):
                controls.addWidget(wdg)
            layout.addLayout(controls)
            self.stats = QLabel("")
            layout.addWidget(self.stats)
            self.setCentralWidget(central)

            self.timer = QTimer(self)
            self.timer.setInterval(33)
            self.timer.timeout.connect(self.refresh)

        def toggle(self) -> None:
            if self.engine is None:
                self.engine = Engine(
                    scale=self.scale.value(),
                    quality=self.quality.currentText(),
                    algorithm=self.algorithm.currentText(),
                    interpolation=self.interp.isChecked(),
                    sink=self._on_frame,
                ).start()
                self.button.setText("Stop")
                self.timer.start()
            else:
                self.timer.stop()
                self.engine.stop()
                self.engine = None
                self.button.setText("Start")

        def _on_frame(self, data: bytes, w: int, h: int) -> None:
            self._latest = (data, w, h)

        def refresh(self) -> None:
            if self._latest is not None:
                data, w, h = self._latest
                img = QImage(data, w, h, w * 4, QImage.Format_RGBA8888)
                self.preview.setPixmap(
                    QPixmap.fromImage(img).scaled(
                        self.preview.size(), Qt.KeepAspectRatio, Qt.SmoothTransformation
                    )
                )
            if self.engine is not None:
                self.stats.setText(str(self.engine.stats()))

    app = QApplication(sys.argv)
    win = MainWindow()
    win.show()
    return app.exec()


if __name__ == "__main__":
    sys.exit(main())
