"""ctypes binding for the native frame-ring runtime, with a pure-Python
fallback (`nu_scaler_tpu.capture.sources.FrameRing`) when the C++ build is
unavailable.

This is the capture-pipeline hot path: the producer thread pushes frames into
native code (no GIL contention on the copy), the consumer drains to the
latest frame (realtime.rs:496-530 semantics).
"""

from __future__ import annotations

import ctypes
import threading
from typing import Optional, Tuple

import numpy as np

_lib = None
_lib_err: Optional[str] = None
_lock = threading.Lock()


def _load():
    global _lib, _lib_err
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        try:
            from nu_scaler_tpu.runtime.native.build import build

            path = build()
            lib = ctypes.CDLL(path)
            lib.nu_ring_create.restype = ctypes.c_void_p
            lib.nu_ring_create.argtypes = [ctypes.c_uint32]
            lib.nu_ring_destroy.argtypes = [ctypes.c_void_p]
            lib.nu_ring_push.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_uint32,
                ctypes.c_uint32,
            ]
            lib.nu_ring_latest.restype = ctypes.c_int
            lib.nu_ring_latest.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.nu_ring_pushed.restype = ctypes.c_uint64
            lib.nu_ring_pushed.argtypes = [ctypes.c_void_p]
            lib.nu_ring_dropped.restype = ctypes.c_uint64
            lib.nu_ring_dropped.argtypes = [ctypes.c_void_p]
            lib.nu_bgra_to_rgba.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_uint64,
            ]
            lib.nu_test_pattern.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_uint32,
                ctypes.c_uint32,
                ctypes.c_uint32,
            ]
            _lib = lib
        except Exception as e:  # noqa: BLE001 — no compiler / build failure
            _lib_err = str(e)
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeFrameRing:
    """Drop-in for `capture.sources.FrameRing` backed by C++."""

    def __init__(self, capacity: int = 5, max_frame_bytes: int = 3840 * 2160 * 4):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native frame ring unavailable: {_lib_err}")
        self._lib = lib
        self._ring = lib.nu_ring_create(capacity)
        self._buf = np.empty(max_frame_bytes, dtype=np.uint8)

    def push(self, frame: Tuple[bytes, int, int]) -> None:
        data, w, h = frame
        arr = np.frombuffer(data, dtype=np.uint8)
        if arr.size != w * h * 4:
            # the C side copies w*h*4 bytes unconditionally; a short buffer
            # would be an out-of-bounds read in native code
            raise ValueError(
                f"frame buffer is {arr.size} bytes, expected {w * h * 4} for {w}x{h} RGBA"
            )
        self._lib.nu_ring_push(
            self._ring,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w,
            h,
        )

    def push_array(self, arr: np.ndarray) -> None:
        h, w = arr.shape[:2]
        arr = np.ascontiguousarray(arr)
        if arr.nbytes != w * h * 4:
            raise ValueError(
                f"frame array is {arr.nbytes} bytes, expected {w * h * 4} for {w}x{h} RGBA"
            )
        self._lib.nu_ring_push(
            self._ring, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h
        )

    def latest(self) -> Optional[Tuple[bytes, int, int]]:
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        trunc = ctypes.c_int()
        ok = self._lib.nu_ring_latest(
            self._ring,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._buf.nbytes,
            ctypes.byref(w),
            ctypes.byref(h),
            ctypes.byref(trunc),
        )
        if not ok or trunc.value:
            return None
        n = w.value * h.value * 4
        return bytes(self._buf[:n].tobytes()), w.value, h.value

    @property
    def frames_pushed(self) -> int:
        return int(self._lib.nu_ring_pushed(self._ring))

    @property
    def frames_dropped(self) -> int:
        return int(self._lib.nu_ring_dropped(self._ring))

    def __len__(self) -> int:  # latest() drains everything; approximation
        return 1 if self.frames_pushed else 0

    def __del__(self):
        try:
            self._lib.nu_ring_destroy(self._ring)
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass


def bgra_to_rgba(bgra: np.ndarray) -> np.ndarray:
    """Native BGRA→RGBA swizzle; numpy fallback."""
    lib = _load()
    flat = np.ascontiguousarray(bgra)
    if lib is None:
        return flat[..., [2, 1, 0, 3]].copy()
    out = np.empty_like(flat)
    lib.nu_bgra_to_rgba(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        flat.size // 4,
    )
    return out


def native_test_pattern(width: int, height: int, tick: int = 0) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native runtime unavailable: {_lib_err}")
    out = np.empty((height, width, 4), dtype=np.uint8)
    lib.nu_test_pattern(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), width, height, tick
    )
    return out
