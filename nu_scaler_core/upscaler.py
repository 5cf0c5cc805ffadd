"""Upscaler classes — API parity with the reference PyO3 surface
(`nu_scaler_core/src/lib.rs:39-166` PyWgpuUpscaler, `:328-735`
PyAdvancedWgpuUpscaler), backed by jit-compiled JAX pipelines on TPU.

Behavioral contracts preserved (SURVEY §2.3):
  * constructors parse case-insensitive strings with silent fallbacks
  * `initialize` computes upscale_scale = mean of axis scales
  * `upscale_scale` setter raises ValueError outside [1.0, 4.0]
  * `upscale` raises RuntimeError when uninitialized or on size mismatch,
    with the reference's message text
  * output bytes are RGBA u8, length out_w*out_h*4

Deliberate deviations (documented in SURVEY §7 "hard parts"):
  * the reference's truncated-dispatch edge bug (upscale/mod.rs:1025 computes
    only floor(out/8)*8 pixels) is NOT reproduced — full frames are computed.
  * `algorithm` accepts the full legacy set (bicubic/lanczos2/lanczos3/
    mitchell/area) in addition to the live nearest/bilinear pair.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import numpy as np

from nu_scaler_core._constants import UpscalingQuality
from nu_scaler_tpu.ops import fsr as _fsr_ops
from nu_scaler_tpu.ops import resample as _resample
from nu_scaler_tpu.runtime.detector import DeviceDetector
from nu_scaler_tpu.runtime.memory import AllocationStrategy, MemoryPool, MemoryPressure


class PyVramStats:
    """Parity with `PyVramStats` (gpu/memory.rs:732-765)."""

    def __init__(self, total_mb: float, used_mb: float, free_mb: float, app_allocated_mb: float):
        self.total_mb = float(total_mb)
        self.used_mb = float(used_mb)
        self.free_mb = float(free_mb)
        self.app_allocated_mb = float(app_allocated_mb)
        self.usage_percent = (used_mb / total_mb) * 100.0 if total_mb > 0 else 0.0

    def __repr__(self) -> str:
        return (
            f"PyVramStats(total_mb={self.total_mb:.1f}, used_mb={self.used_mb:.1f}, "
            f"free_mb={self.free_mb:.1f}, usage={self.usage_percent:.1f}%)"
        )


class PyWgpuUpscaler:
    """`PyWgpuUpscaler` (lib.rs:39-166). quality: ultra|quality|balanced|
    performance; algorithm: nearest|bilinear (+ the legacy tiers)."""

    def __init__(self, quality: str = "quality", algorithm: str = "nearest"):
        self._quality = UpscalingQuality.parse(quality)
        self._algorithm = _resample.normalize_algorithm(algorithm)
        self._upscale_scale = 2.0
        self._initialized = False
        self._fn = None
        self._batch_fn = None
        self.input_width = 0
        self.input_height = 0
        self.output_width = 0
        self.output_height = 0
        # compat knobs (lib.rs:118-137); stored and surfaced, no thread pool
        # exists on the XLA path (batching is one fused device program)
        self._thread_count = 4
        self._buffer_pool_size = 3
        self._gpu_allocator = "default"
        self._shader_path = ""

    # -- lifecycle --------------------------------------------------------

    def initialize(
        self, input_width: int, input_height: int, output_width: int, output_height: int
    ) -> None:
        if input_width > 0 and input_height > 0:
            self._upscale_scale = (
                output_width / input_width + output_height / input_height
            ) / 2.0
        if min(input_width, input_height, output_width, output_height) <= 0:
            raise RuntimeError("Invalid dimensions: all must be positive")
        self.input_width = int(input_width)
        self.input_height = int(input_height)
        self.output_width = int(output_width)
        self.output_height = int(output_height)
        self._fn = _resample.make_resampler(
            self.input_height, self.input_width, self.output_height, self.output_width,
            self._algorithm,
        )
        self._batch_polymorphic = True
        self._initialized = True

    # -- properties -------------------------------------------------------

    @property
    def upscale_scale(self) -> float:
        return self._upscale_scale

    @upscale_scale.setter
    def upscale_scale(self, scale: float) -> None:
        if scale < 1.0 or scale > 4.0:
            raise ValueError("Scale factor must be between 1.0 and 4.0")
        self._upscale_scale = float(scale)

    @property
    def name(self) -> str:
        return "WgpuUpscaler"

    @property
    def algorithm(self) -> str:
        return self._algorithm

    # -- core path --------------------------------------------------------

    def _to_array(self, data: bytes) -> np.ndarray:
        expected = self.input_width * self.input_height * 4
        if len(data) != expected:
            raise RuntimeError(
                f"Input data size ({len(data)}) does not match expected input buffer "
                f"size ({expected} for {self.input_width}x{self.input_height})"
            )
        return np.frombuffer(data, dtype=np.uint8).reshape(
            self.input_height, self.input_width, 4
        )

    def _check_ready(self) -> None:
        if not self._initialized:
            raise RuntimeError("Upscaler not initialized. Call initialize() first.")

    def upscale(self, data: bytes) -> bytes:
        """Single-frame hot path (SURVEY §3.1) — one fused XLA dispatch, one
        device round trip."""
        self._check_ready()
        arr = self._to_array(bytes(data))
        out = self._fn(arr)
        return np.asarray(out).tobytes()

    def upscale_arr(self, arr: np.ndarray) -> jax.Array:
        """Extension: array-in/array-out, result stays device-resident — the
        zero-readback path the streaming pipeline uses."""
        self._check_ready()
        return self._fn(arr)

    def upscale_batch(self, frames: Iterable[bytes]) -> list[bytes]:
        """Batch path: the reference fans frames over a rayon pool
        (upscale/mod.rs:609-640); here the whole batch is ONE device program
        over a stacked [N,H,W,4] array (bodies are batch-polymorphic). On a
        multi-chip mesh the batch is sharded data-parallel over the devices
        (the rayon→ICI mapping of SURVEY §2.6)."""
        self._check_ready()
        if not getattr(self, "_batch_polymorphic", True):
            arrs = [self._to_array(bytes(f)) for f in frames]
            return [np.asarray(self._fn(a)).tobytes() for a in arrs]
        stacked = np.stack([self._to_array(bytes(f)) for f in frames])
        if jax.device_count() > 1:
            from nu_scaler_tpu.parallel.mesh import upscale_batch_sharded

            out = np.asarray(
                upscale_batch_sharded(
                    stacked, self.output_height, self.output_width, self._algorithm
                )
            )
        else:
            out = np.asarray(self._fn(stacked))
        return [out[i].tobytes() for i in range(out.shape[0])]

    # -- compat knobs -----------------------------------------------------

    def reload_shader(self, path: str) -> None:
        """Shader hot-reload compat (lib.rs:115-121). There is no WGSL to
        reload; this instance's kernel is rebuilt fresh (bypassing the shared
        LRU) so the call remains a meaningful 'recompile now' hook without
        evicting other live upscalers' compiled programs."""
        self._shader_path = str(path)
        if self._initialized:
            self._rebuild_kernel()

    def _rebuild_kernel(self) -> None:
        """Rebuild only this instance's compiled kernel (subclasses override
        to rebuild their own tier)."""
        self._fn = _resample.make_resampler.__wrapped__(
            self.input_height, self.input_width,
            self.output_height, self.output_width, self._algorithm,
        )

    def set_thread_count(self, n: int) -> None:
        if n > 0:
            self._thread_count = int(n)

    def set_buffer_pool_size(self, n: int) -> None:
        if n > 0:
            self._buffer_pool_size = int(n)

    def set_gpu_allocator(self, preset: str) -> None:
        self._gpu_allocator = str(preset)


class PyAdvancedWgpuUpscaler(PyWgpuUpscaler):
    """`PyAdvancedWgpuUpscaler` (lib.rs:328-735): adds device detection, HBM
    stats, allocation strategy, adaptive quality and cleanup."""

    def __init__(
        self, quality: str = "quality", algorithm: str = "nearest", adaptive_quality: bool = True
    ):
        super().__init__(quality, algorithm)
        self._adaptive_quality = bool(adaptive_quality)
        # the tier the USER asked for — adaptive pressure may degrade below
        # it and later restore back up to it, never beyond
        self._requested_quality = self._quality
        self._detector = DeviceDetector()
        self._detector.detect_gpus()
        self._device = self._detector.get_primary_device()
        self._pool = MemoryPool(self._device)
        # "force GPU activation" at construction (lib.rs:370-375): pay the
        # device wake-up cost up front
        try:
            self._pool.force_gpu_usage()
        except Exception as e:  # noqa: BLE001 — warning only, like the reference
            print(f"Warning: Failed to force GPU activation: {e}")

    # -- lifecycle --------------------------------------------------------

    def initialize(
        self, input_width: int, input_height: int, output_width: int, output_height: int
    ) -> None:
        super().initialize(input_width, input_height, output_width, output_height)
        self._upscale_scale = output_width / input_width  # lib.rs:434 (width-only)
        # the learned "quality" tier (BASELINE.json north star: ESRGAN-lite
        # replaces the dlss-sys/fsr3-sys role, served through
        # create_advanced_upscaler("ultra")) — used when a trained checkpoint
        # exists for this scale, falling back to the classical kernel
        self._serving_tier = "classical"
        if self._quality == UpscalingQuality.ULTRA:
            try:
                from nu_scaler_tpu.models import esrgan_lite

                # learned_prefer (set by the facade per dlss×quality
                # request): "performance" serves the fast arch ladder,
                # "ultra" the held-out quality peak (tpu4), default the
                # ≥240 fps quality-first ladder (tpu4b2)
                prefer = getattr(self, "learned_prefer", "quality")
                if prefer == "performance":
                    self._fn = esrgan_lite.make_fast_upscaler(
                        self.input_height, self.input_width,
                        self.output_height, self.output_width,
                    )
                else:
                    self._fn = esrgan_lite.make_pretrained_upscaler(
                        self.input_height, self.input_width,
                        self.output_height, self.output_width,
                        prefer=prefer,
                    )
                self._batch_polymorphic = False  # net body is single-frame
                self._serving_tier = "learned"
            except Exception as e:  # noqa: BLE001
                print(f"Warning: learned tier unavailable, classical kernel kept: {e}")
        # strategy by image size (lib.rs:437-456)
        total_pixels = input_width * input_height
        if total_pixels > 4 * 1920 * 1080:
            self._pool.set_allocation_strategy(AllocationStrategy.CONSERVATIVE)
        elif total_pixels > 1920 * 1080:
            self._pool.set_allocation_strategy(AllocationStrategy.BALANCED)
        else:
            self._pool.set_allocation_strategy(AllocationStrategy.AGGRESSIVE)
        self._pool.update_vram_usage(force=True)

    def _rebuild_kernel(self) -> None:
        # re-run the tier selection (classical kernel vs learned ultra tier)
        self.initialize(
            self.input_width, self.input_height, self.output_width, self.output_height
        )

    # -- advanced features ------------------------------------------------

    def force_gpu_activation(self) -> None:
        self._pool.force_gpu_usage()
        self._pool.update_vram_usage(force=True)

    def upscale(self, data: bytes) -> bytes:
        # pressure check before work (lib.rs:492-501)
        if self._pool.get_current_memory_pressure() in (
            MemoryPressure.HIGH,
            MemoryPressure.CRITICAL,
        ):
            self.cleanup_memory()
        out = super().upscale(data)
        if self._adaptive_quality:
            self._update_adaptive_quality()
        return out

    def upscale_batch(self, frames: Iterable[bytes]) -> list[bytes]:
        """Learned-tier batch path: ONE vmapped device program over the
        stacked frames (`esrgan_lite.make_pretrained_batch_upscaler`); a
        multi-device mesh shards the batch data-parallel
        (`mesh.esrgan_batch_sharded`, N chips ≈ N× throughput). Classical
        tiers keep the batch-polymorphic base path. On a single chip the
        win is host↔device round-trip grouping, not kernel time (measured
        r4, tools/experiments/esrgan_batch_honest.py); the live loop keeps
        single-frame `upscale` (latency)."""
        if getattr(self, "_serving_tier", "classical") != "learned":
            return super().upscale_batch(frames)
        self._check_ready()
        stacked = np.stack([self._to_array(bytes(f)) for f in frames])
        prefer = getattr(self, "learned_prefer", "quality")
        if jax.device_count() > 1:
            from nu_scaler_tpu.parallel.mesh import esrgan_batch_sharded

            out = np.asarray(esrgan_batch_sharded(
                stacked, self.output_height, self.output_width, prefer=prefer
            ))
        else:
            from nu_scaler_tpu.models import esrgan_lite

            bfn = esrgan_lite.make_pretrained_batch_upscaler(
                self.input_height, self.input_width,
                self.output_height, self.output_width, prefer=prefer,
            )
            out = np.asarray(bfn(stacked))
        if self._adaptive_quality:
            self._update_adaptive_quality()
        return [out[i].tobytes() for i in range(out.shape[0])]

    _QUALITY_RANK = {
        UpscalingQuality.ULTRA: 5,
        UpscalingQuality.QUALITY: 4,
        UpscalingQuality.BALANCED: 3,
        UpscalingQuality.PERFORMANCE: 2,
        UpscalingQuality.ULTRA_PERFORMANCE: 1,
        UpscalingQuality.NATIVE: 0,
    }

    def _update_adaptive_quality(self) -> None:
        """VRAM-pressure quality ladder (upscale/mod.rs:355-409): >85% usage
        steps quality down one tier, <50% steps back up.

        The reference computes the new tier but can only *recommend* it
        (`needs_reinit`, never acted on). Here a tier change REBUILDS the
        serving kernel, so a pressure-downgraded ULTRA instance actually swaps
        the learned net for the cheaper classical kernel on the next
        `upscale()` — graceful degradation is the point of the feature
        (SURVEY §5 failure-handling). When pressure clears, the tier restores
        back up toward (never beyond) the user-requested quality."""
        pct = self._pool.get_vram_stats().usage_percent
        down = {
            UpscalingQuality.ULTRA: UpscalingQuality.QUALITY,
            UpscalingQuality.QUALITY: UpscalingQuality.BALANCED,
            UpscalingQuality.BALANCED: UpscalingQuality.PERFORMANCE,
        }
        up = {
            UpscalingQuality.QUALITY: UpscalingQuality.ULTRA,
            UpscalingQuality.BALANCED: UpscalingQuality.QUALITY,
            UpscalingQuality.PERFORMANCE: UpscalingQuality.BALANCED,
            UpscalingQuality.ULTRA_PERFORMANCE: UpscalingQuality.PERFORMANCE,
        }
        new_q = self._quality
        if pct > 85.0:
            new_q = down.get(self._quality, self._quality)
        elif pct < 50.0:
            cand = up.get(self._quality, self._quality)
            req = getattr(self, "_requested_quality", self._quality)
            if self._QUALITY_RANK[cand] <= self._QUALITY_RANK[req]:
                new_q = cand
        self.recommended_quality = new_q
        if new_q != self._quality:
            self._quality = new_q
            if self._initialized:
                # rebuild the serving kernel for the new tier (learned ⇄
                # classical swap); classical kernels come from the shared LRU
                # so re-upgrades don't recompile
                self.initialize(
                    self.input_width, self.input_height,
                    self.output_width, self.output_height,
                )

    def get_vram_stats(self) -> PyVramStats:
        s = self._pool.get_vram_stats()
        return PyVramStats(s.total_mb, s.used_mb, s.free_mb, s.app_allocated_mb)

    def set_memory_strategy(self, strategy: str) -> None:
        self._pool.set_allocation_strategy(strategy)

    def get_vram_usage_percent(self) -> float:
        return self._pool.get_vram_stats().usage_percent

    @property
    def adaptive_quality(self) -> bool:
        return self._adaptive_quality

    @adaptive_quality.setter
    def adaptive_quality(self, enabled: bool) -> None:
        self._adaptive_quality = bool(enabled)

    def cleanup_memory(self) -> None:
        self._pool.cleanup_memory()

    def get_quality_str(self) -> str:
        return self._quality.value

    @property
    def quality(self) -> str:
        return self._quality.value

    @quality.setter
    def quality(self, q: str) -> None:
        self._quality = UpscalingQuality.parse(q)
        self._requested_quality = self._quality
        if self._initialized:
            self.initialize(
                self.input_width, self.input_height,
                self.output_width, self.output_height,
            )

    def update_gpu_stats(self) -> None:
        self._pool.update_vram_usage(force=True)

    def get_gpu_info(self) -> dict:
        """Dict-key parity with lib.rs:667-704."""
        info = self._detector.get_primary_gpu()
        if info is None:
            return {"name": "No GPU detected", "error": "GPU info not available"}
        d = info.as_dict()
        d["allocated_buffers"] = self._pool.get_allocated_buffers_count()
        d["allocated_bytes"] = self._pool.get_allocated_bytes()
        s = self._pool.get_vram_stats()
        d["total_vram_mb"] = s.total_mb
        d["used_vram_mb"] = s.used_mb
        d["free_vram_mb"] = s.free_mb
        return d

    def force_cleanup(self) -> None:
        self.cleanup_memory()
        self._pool.update_vram_usage(force=True)

    def get_native_device_handle(self):
        """Escape hatch to the underlying accelerator object — the role of
        `GpuResources::get_native_device_handle` (gpu/mod.rs:103-240, which
        exposed ID3D12Device*/vkDevice for vendor SDKs). Here it is the
        `jax.Device`, giving callers memory_stats(), platform info etc."""
        return self._device


class PyFsrUpscaler(PyWgpuUpscaler):
    """The FSR tier, actually implemented (the reference's
    `create_fsr_upscaler` raised NotImplementedError, lib.rs:788-805):
    EASU + RCAS Pallas/XLA pipeline (upscale/fsr.rs:24-260 semantics)."""

    def __init__(self, quality: str = "quality"):
        super().__init__(quality, "bilinear")

    def initialize(
        self, input_width: int, input_height: int, output_width: int, output_height: int
    ) -> None:
        super().initialize(input_width, input_height, output_width, output_height)
        self._fn = _fsr_ops.make_fsr_upscaler(
            self.input_height, self.input_width, self.output_height, self.output_width,
            self._quality.value,
        )

    @property
    def name(self) -> str:
        return "FsrUpscaler"

    def _rebuild_kernel(self) -> None:
        self._fn = _fsr_ops.make_fsr_upscaler.__wrapped__(
            self.input_height, self.input_width,
            self.output_height, self.output_width, self._quality.value,
        )

    def upscale_batch(self, frames: Iterable[bytes]) -> list[bytes]:
        self._check_ready()
        arrs = [self._to_array(bytes(f)) for f in frames]
        try:
            # the fused Pallas pipeline takes [N, H, W, 4] in one call
            out = np.asarray(self._fn(np.stack(arrs)))
            return [out[i].tobytes() for i in range(out.shape[0])]
        except Exception:  # noqa: BLE001 — XLA polyphase path is single-frame
            return [np.asarray(self._fn(a)).tobytes() for a in arrs]


def create_advanced_upscaler(quality: str) -> PyAdvancedWgpuUpscaler:
    """lib.rs:737-740."""
    return PyAdvancedWgpuUpscaler(quality, "bilinear", True)


def create_fsr_upscaler(quality: str) -> PyFsrUpscaler:
    """Working replacement for the reference's NotImplemented stub."""
    return PyFsrUpscaler(quality)


def create_best_upscaler(quality: str) -> PyAdvancedWgpuUpscaler:
    """The function `nu_scaler_py/nu_scaler/benchmark.py:88` calls but the
    reference never exported (SURVEY §2.3 'known drift') — provided here."""
    return PyAdvancedWgpuUpscaler(quality, "bilinear", True)
