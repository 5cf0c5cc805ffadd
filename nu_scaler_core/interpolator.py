"""WgpuFrameInterpolator — API parity with the reference PyO3 class
(`nu_scaler_core/src/wgpu_interpolator.rs:172-497`), backed by the jitted
JAX interpolation pipeline (`nu_scaler_tpu/ops/interpolate.py`).

Parity notes:
  * ctor takes an optional workgroup preset string
    ("8x8"|"16x16"|"32x8"/"wide"|"8x32"/"tall", default Wide32x8,
    wgpu_interpolator.rs:118-127). On TPU this is kept as a tuning knob for
    the Pallas block shape; the XLA path ignores it.
  * `interpolate_py(a, b, w, h, *, time_t=0.5)` with the reference's
    ValueError message on size mismatch (:230-238).
  * The *shipped* reference behavior is zero-flow cross-fade (:276-295) —
    that is `mode="blend"`, the default. `mode="flow"` enables the full
    pyramid → Horn–Schunck → refine → warp pipeline the reference designed
    but never got past its WGSL parser bugs (:816-839).
  * `get_last_gpu_duration_ms()` returns the device-side duration of the last
    interpolate call's shape (the reference used TIMESTAMP_QUERY, :389-438;
    here a cached per-(shape, mode) fori_loop calibration measures pure device
    time — wall timing through the axon tunnel would measure ~29 ms of fetch
    overhead instead). `get_last_gpu_duration_detail()` adds the per-stage
    breakdown the reference's timestamp pairs implied.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from nu_scaler_tpu.ops import interpolate as _interp

# (height, width, mode) pipelines already compiled+run once in this process —
# interpolate_py warms each key a single time, not once per call
_WARM: set = set()
_FETCH_OVERHEAD_S: Optional[float] = None

_PRESETS = {
    "8x8": (8, 8),
    "square8x8": (8, 8),
    "16x16": (16, 16),
    "square16x16": (16, 16),
    "32x8": (32, 8),
    "wide32x8": (32, 8),
    "wide": (32, 8),
    "8x32": (8, 32),
    "tall8x32": (8, 32),
    "tall": (8, 32),
}


class WgpuFrameInterpolator:
    def __init__(self, workgroup_preset_str: Optional[str] = None, mode: str = "blend"):
        preset = None
        if workgroup_preset_str is not None:
            preset = _PRESETS.get(str(workgroup_preset_str).lower())
        if preset is None:
            preset = (32, 8)  # default Wide32x8 (wgpu_interpolator.rs:180-186)
        self.workgroup_preset = preset
        # TPU mapping of the workgroup preset: the warp pass's block shape
        # (rows = preset y, cols = 4·preset x — the default Wide32x8 lands on
        # the measured-optimal (8, 128) tile). The reference string-replaced
        # @workgroup_size in the warp WGSL (wgpu_interpolator.rs:98-127).
        self.warp_tile = (preset[1], 4 * preset[0])
        self.mode = mode
        self._last_key: Optional[tuple] = None
        self._last_wall_ms: Optional[float] = None

    # -- main entry (PyBytes parity) --------------------------------------

    def interpolate_py(
        self,
        frame_a_bytes: bytes,
        frame_b_bytes: bytes,
        width: int,
        height: int,
        *,
        time_t: float = 0.5,
    ) -> bytes:
        expected = width * height * 4
        a = bytes(frame_a_bytes)
        b = bytes(frame_b_bytes)
        if len(a) != expected or len(b) != expected:
            raise ValueError(
                f"Expected {expected} bytes per frame for {width}x{height}x4 RGBA, "
                f"got frame_a: {len(a)} bytes, frame_b: {len(b)} bytes"
            )
        arr_a = np.frombuffer(a, np.uint8).reshape(height, width, 4)
        arr_b = np.frombuffer(b, np.uint8).reshape(height, width, 4)

        global _FETCH_OVERHEAD_S
        fn = _interp.make_interpolator(height, width, self.mode, warp_tile=self.warp_tile)
        key = (height, width, self.mode, self.warp_tile)
        if key not in _WARM:
            # compile once per (shape, mode) process-wide; every later call is
            # a single device dispatch (the round-1 version re-ran the full
            # pipeline twice per call as an always-on "warm-up")
            np.asarray(fn(arr_a, arr_b, time_t))
            _WARM.add(key)
        if _FETCH_OVERHEAD_S is None:
            from nu_scaler_tpu.utils import tracing

            _FETCH_OVERHEAD_S = tracing.fetch_overhead_s(reps=3)
        t0 = time.perf_counter()
        out = np.asarray(fn(arr_a, arr_b, time_t))
        wall = (time.perf_counter() - t0) - _FETCH_OVERHEAD_S
        self._last_wall_ms = max(wall, 0.0) * 1000.0
        self._last_key = key
        return out.tobytes()

    def interpolate_multi_py(
        self,
        frame_a_bytes: bytes,
        frame_b_bytes: bytes,
        width: int,
        height: int,
        *,
        times: tuple = (1.0 / 3.0, 2.0 / 3.0),
    ) -> list:
        """N-factor frame generation (TPU extension): one motion solve, one
        in-between frame per entry of `times` — e.g. the default (1/3, 2/3)
        turns a 30 fps pair stream into 90 fps output. The reference's FSR3
        tier interpolates N frames from one motion-vector field the same way
        (`Nu_scale/src/upscale/fsr3.rs:319-376`); its shipped wgpu path only
        ever exposed a single t (`wgpu_interpolator.rs:216`). Returns a list
        of RGBA byte frames, ordered by t."""
        expected = width * height * 4
        a = bytes(frame_a_bytes)
        b = bytes(frame_b_bytes)
        if len(a) != expected or len(b) != expected:
            raise ValueError(
                f"Expected {expected} bytes per frame for {width}x{height}x4 RGBA, "
                f"got frame_a: {len(a)} bytes, frame_b: {len(b)} bytes"
            )
        ts = tuple(float(t) for t in times)
        if not ts or not all(0.0 <= t <= 1.0 for t in ts):
            raise ValueError(f"times must be non-empty, each in [0, 1]: {times!r}")
        arr_a = np.frombuffer(a, np.uint8).reshape(height, width, 4)
        arr_b = np.frombuffer(b, np.uint8).reshape(height, width, 4)
        mode = self.mode if self.mode in ("blend", "flow", "flow_soft", "flow_soft_ref") else "flow_soft"
        fn = _interp.make_multi_interpolator(
            height, width, ts, mode, warp_tile=self.warp_tile
        )
        t0 = time.perf_counter()
        out = np.asarray(fn(arr_a, arr_b))
        self._last_wall_ms = (time.perf_counter() - t0) * 1000.0
        self._last_key = None  # multi-step calibration keys are per-factor
        return [out[i].tobytes() for i in range(out.shape[0])]

    def get_last_gpu_duration_ms(self) -> Optional[float]:
        """Device-side ms for the last call's (shape, mode) — a cached
        fori_loop calibration (first call per shape pays one extra compile);
        falls back to tunnel-corrected wall time if calibration fails."""
        if self._last_key is None:
            return None
        try:
            return _interp.calibrated_step_ms(*self._last_key)
        except Exception:  # noqa: BLE001 — timing must never break the caller
            return self._last_wall_ms

    def get_last_gpu_duration_detail(self) -> Optional[dict]:
        """Per-stage device timings for the last call's (shape, mode) — the
        reference's per-pass timestamp pairs (total + flow + warp for the flow
        modes), plus the host-observed wall ms of the actual last call."""
        if self._last_key is None:
            return None
        try:
            detail = dict(_interp.stage_timings_ms(*self._last_key))
        except Exception:  # noqa: BLE001
            detail = {}
        detail["wall_ms"] = self._last_wall_ms
        return detail

    # -- Rust-side API surface (tests used these; wgpu_interpolator.rs) ----

    def interpolate(self, frame_a: np.ndarray, frame_b: np.ndarray, time_t: float = 0.5):
        """Array-in/array-out; honors self.mode."""
        return _interp.interpolate_frames(frame_a, frame_b, time_t, self.mode)

    def build_pyramid(self, frame: np.ndarray, levels: int = _interp.DEFAULT_PYRAMID_LEVELS):
        """`build_pyramid` (wgpu_interpolator.rs:969-1100): Gaussian pyramid of
        f32 RGBA levels."""
        import jax.numpy as jnp

        f = jnp.asarray(frame, jnp.uint8).astype(jnp.float32) / 255.0
        return _interp.build_pyramid(f, levels)

    def compute_coarse_flow(
        self,
        frame_a: np.ndarray,
        frame_b: np.ndarray,
        iters: int = _interp.DEFAULT_COARSE_ITERS,
        lam: float = _interp.DEFAULT_LAMBDA,
    ):
        """`compute_coarse_flow` (wgpu_interpolator.rs:1102-1203): HS Jacobi
        flow at the given resolution, starting from zero."""
        import jax.numpy as jnp

        a = jnp.asarray(frame_a, jnp.uint8).astype(jnp.float32) / 255.0
        b = jnp.asarray(frame_b, jnp.uint8).astype(jnp.float32) / 255.0
        la, lb = _interp.luminance(a), _interp.luminance(b)
        flow0 = jnp.zeros(la.shape + (2,), jnp.float32)
        return _interp.horn_schunck(la, lb, flow0, iters, lam)

    def refine_flow_hierarchy(
        self,
        frame_a: np.ndarray,
        frame_b: np.ndarray,
        levels: int = _interp.DEFAULT_PYRAMID_LEVELS,
    ):
        """`refine_flow_hierarchy` (wgpu_interpolator.rs:1238-1366) — the full
        coarse-to-fine flow (panicked via stubbed pipelines in the reference;
        implemented here)."""
        return _interp.compute_flow(
            np.asarray(frame_a, np.uint8), np.asarray(frame_b, np.uint8), levels
        )


def create_interpolator(kind: str = "blend", workgroup_preset: Optional[str] = None) -> WgpuFrameInterpolator:
    """Interpolator factory — the `InterpolatorFactory` role of the
    reference's never-compiled CPU module (interpolation/mod.rs, SURVEY C11).

    kind: "blend" (shipped zero-flow cross-fade) | "flow" (block-MC
    production pipeline) | "flow_soft" (block-MC with overlapped-tile
    blending — seam-free at motion boundaries) | "flow_exact" (per-pixel
    warp, golden-parity). Unknown kinds fall back to "blend"
    (reference-style silent default).
    """
    if kind not in ("blend", "flow", "flow_soft", "flow_soft_ref", "flow_exact"):
        kind = "blend"
    return WgpuFrameInterpolator(workgroup_preset, mode=kind)
