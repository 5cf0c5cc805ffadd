"""Engine/Capture/Upscaler/Renderer facade — the package API the reference
*planned* but left as empty placeholder classes
(`nu_scaler_py/nu_scaler/core.py:1-31`, P7). Implemented here for real on the
TPU core."""

from __future__ import annotations

from typing import Callable, Optional

import nu_scaler_core
from nu_scaler.live import LiveSession


class Capture:
    """Thin facade over PyScreenCapture."""

    def __init__(self, source: str = "fullscreen"):
        self._cap = nu_scaler_core.PyScreenCapture()
        self.source = source

    def start(self) -> None:
        if self.source.startswith("window:"):
            self._cap.start(
                nu_scaler_core.PyCaptureTarget.WindowByTitle,
                nu_scaler_core.PyWindowByTitle(self.source.split(":", 1)[1]),
            )
        elif self.source.startswith("region:"):
            x, y, w, h = (int(v) for v in self.source.split(":", 1)[1].split(","))
            self._cap.start(
                nu_scaler_core.PyCaptureTarget.Region,
                None,
                nu_scaler_core.PyRegion(x, y, w, h),
            )
        else:
            self._cap.start(nu_scaler_core.PyCaptureTarget.FullScreen)

    def stop(self) -> None:
        self._cap.stop()

    def frame(self):
        return self._cap.get_frame()

    @staticmethod
    def list_windows() -> list[str]:
        return nu_scaler_core.PyScreenCapture.list_windows()


class Upscaler:
    """Thin facade over the core upscalers with tech selection."""

    def __init__(self, technology: str = "auto", quality: str = "quality", algorithm: str = "lanczos3"):
        if technology == "fsr":
            self._up = nu_scaler_core.create_fsr_upscaler(quality)
        elif technology in ("auto", "advanced"):
            self._up = nu_scaler_core.PyAdvancedWgpuUpscaler(quality, algorithm, True)
        else:
            self._up = nu_scaler_core.PyWgpuUpscaler(quality, algorithm)

    def initialize(self, in_w: int, in_h: int, out_w: int, out_h: int) -> None:
        self._up.initialize(in_w, in_h, out_w, out_h)

    def upscale(self, data: bytes) -> bytes:
        return self._up.upscale(data)

    @property
    def inner(self):
        return self._up


class Renderer:
    """Frame sink. The reference presents via QPixmap in the UI; headless
    deployments push frames to a callback (file writer, encoder, socket)."""

    def __init__(self, sink: Optional[Callable[[bytes, int, int], None]] = None):
        self.sink = sink or (lambda d, w, h: None)
        self.frames = 0

    def present(self, data: bytes, width: int, height: int) -> None:
        self.frames += 1
        self.sink(data, width, height)


class Engine:
    """Capture → upscale (→ interpolate) → render, composed."""

    def __init__(
        self,
        source: str = "fullscreen",
        scale: float = 2.0,
        quality: str = "quality",
        technology: str = "wgpu",
        algorithm: str = "lanczos3",
        interpolation: bool = False,
        sink: Optional[Callable[[bytes, int, int], None]] = None,
    ):
        self.renderer = Renderer(sink)
        target = None
        if source.startswith("window:"):
            target = nu_scaler_core.PyCaptureTarget.WindowByTitle
        self.session = LiveSession(
            scale=scale,
            algorithm=algorithm,
            quality=quality,
            technology=technology,
            interpolation=interpolation,
            target=target,
            sink=self.renderer.present,
        )

    def start(self) -> "Engine":
        self.session.start()
        return self

    def stop(self) -> None:
        self.session.stop()

    def stats(self) -> dict:
        return self.session.stats()
