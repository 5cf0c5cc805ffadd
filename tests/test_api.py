"""API-surface parity tests for the `nu_scaler_core` facade.

These port the reference's manual acceptance scripts (SURVEY §4):
`nu_scaler_py/test_basic.py` (gradient 2x bilinear upscale),
`nu_scaler_core/upscale_test.py`, `test_interpolator.py`, plus the byte/
error-message contracts of lib.rs.
"""

import numpy as np
import pytest

import nu_scaler_core as nsc
from nu_scaler_tpu.kernels import reference as ref
from nu_scaler_tpu.ops.metrics import psnr


def test_module_surface():
    """Everything the reference pymodule registers (lib.rs:743-812) exists."""
    for name in [
        "PyWgpuUpscaler",
        "PyAdvancedWgpuUpscaler",
        "PyScreenCapture",
        "PyCaptureTarget",
        "PyWindowByTitle",
        "PyRegion",
        "PyVramStats",
        "PyBenchmarkResult",
        "WgpuFrameInterpolator",
        "create_advanced_upscaler",
        "create_fsr_upscaler",
        "create_best_upscaler",
        "py_benchmark_upscaler",
        "py_run_comparison_benchmark",
        "QUALITY_ULTRA",
        "QUALITY_QUALITY",
        "QUALITY_BALANCED",
        "QUALITY_PERFORMANCE",
        "TECH_FSR",
        "TECH_DLSS",
        "TECH_WGPU",
        "TECH_FALLBACK",
        "VENDOR_NVIDIA",
        "VENDOR_AMD",
        "VENDOR_INTEL",
        "VENDOR_OTHER",
    ]:
        assert hasattr(nsc, name), f"missing export: {name}"


def test_basic_upscale_flow(pattern):
    """The test_basic.py acceptance path: 320x240 gradient → 2x bilinear."""
    img = pattern(320, 240)
    up = nsc.PyWgpuUpscaler("quality", "bilinear")
    up.initialize(320, 240, 640, 480)
    out = up.upscale(img.tobytes())
    assert isinstance(out, bytes) and len(out) == 640 * 480 * 4
    out_arr = np.frombuffer(out, np.uint8).reshape(480, 640, 4)
    golden = ref.bilinear_ref(img, 480, 640)
    assert psnr(out_arr, golden) >= 50.0


def test_upscaler_ctor_defaults_and_fallbacks():
    up = nsc.PyWgpuUpscaler()
    assert up.name == "WgpuUpscaler"
    assert up.algorithm == "nearest"
    assert up.upscale_scale == 2.0
    # silent fallback parsing (lib.rs:50-62)
    up2 = nsc.PyWgpuUpscaler("bogus-quality", "bogus-algo")
    assert up2.algorithm == "nearest"
    # extended algorithm set
    up3 = nsc.PyWgpuUpscaler("ultra", "lanczos3")
    assert up3.algorithm == "lanczos3"


def test_scale_clamp():
    up = nsc.PyWgpuUpscaler()
    up.upscale_scale = 3.5
    assert up.upscale_scale == 3.5
    with pytest.raises(ValueError, match="Scale factor must be between 1.0 and 4.0"):
        up.upscale_scale = 0.5
    with pytest.raises(ValueError, match="Scale factor must be between 1.0 and 4.0"):
        up.upscale_scale = 4.5


def test_initialize_sets_mean_scale():
    up = nsc.PyWgpuUpscaler()
    up.initialize(100, 100, 300, 100)  # ws=3, hs=1 → mean 2
    assert up.upscale_scale == pytest.approx(2.0)


def test_uninitialized_error():
    up = nsc.PyWgpuUpscaler()
    with pytest.raises(RuntimeError, match="Upscaler not initialized"):
        up.upscale(b"\x00" * 16)


def test_size_mismatch_error(pattern):
    up = nsc.PyWgpuUpscaler("quality", "nearest")
    up.initialize(32, 24, 64, 48)
    with pytest.raises(RuntimeError, match="does not match expected input buffer size"):
        up.upscale(b"\x00" * 100)


def test_upscale_batch(pattern):
    up = nsc.PyWgpuUpscaler("quality", "bilinear")
    up.initialize(32, 24, 64, 48)
    frames = [pattern(32, 24).tobytes() for _ in range(4)]
    outs = up.upscale_batch(frames)
    assert len(outs) == 4
    assert all(len(o) == 64 * 48 * 4 for o in outs)
    assert outs[0] == up.upscale(frames[0])


def test_compat_knobs(tmp_path):
    up = nsc.PyWgpuUpscaler()
    up.set_thread_count(8)
    up.set_buffer_pool_size(4)
    up.set_gpu_allocator("aggressive")
    up.initialize(16, 16, 32, 32)
    up.reload_shader(str(tmp_path / "fake.wgsl"))  # recompile hook, no error
    out = up.upscale(b"\x01" * (16 * 16 * 4))
    assert len(out) == 32 * 32 * 4


def test_advanced_upscaler(pattern):
    up = nsc.create_advanced_upscaler("quality")
    up.initialize(64, 48, 128, 96)
    img = pattern(64, 48)
    out = up.upscale(img.tobytes())
    assert len(out) == 128 * 96 * 4
    stats = up.get_vram_stats()
    assert stats.total_mb > 0
    assert 0.0 <= stats.usage_percent <= 100.0
    assert isinstance(up.get_vram_usage_percent(), float)
    info = up.get_gpu_info()
    for key in [
        "name", "vendor", "device_type", "backend", "vendor_id", "device_id",
        "driver_info", "is_discrete", "allocated_buffers", "allocated_bytes",
        "total_vram_mb", "used_vram_mb", "free_vram_mb",
    ]:
        assert key in info, f"get_gpu_info missing {key}"
    assert up.adaptive_quality is True
    up.adaptive_quality = False
    assert up.adaptive_quality is False
    assert up.get_quality_str() == "quality"
    up.quality = "ultra"
    assert up.get_quality_str() == "ultra"
    up.set_memory_strategy("aggressive")
    up.update_gpu_stats()
    up.cleanup_memory()
    up.force_cleanup()
    up.force_gpu_activation()


def test_create_best_upscaler():
    up = nsc.create_best_upscaler("balanced")
    assert isinstance(up, nsc.PyAdvancedWgpuUpscaler)


def test_fsr_upscaler_works(pattern):
    """The reference raised NotImplementedError here (lib.rs:788-805)."""
    up = nsc.create_fsr_upscaler("quality")
    up.initialize(32, 24, 64, 48)
    out = up.upscale(pattern(32, 24).tobytes())
    assert len(out) == 64 * 48 * 4
    assert up.name == "FsrUpscaler"


def test_interpolator_parity(pattern):
    """test_interpolator.py acceptance: red/blue square blend at 64x64."""
    interp = nsc.WgpuFrameInterpolator()
    a = np.zeros((64, 64, 4), np.uint8)
    a[..., 0] = 255
    a[..., 3] = 255
    b = np.zeros((64, 64, 4), np.uint8)
    b[..., 2] = 255
    b[..., 3] = 255
    out = interp.interpolate_py(a.tobytes(), b.tobytes(), 64, 64, time_t=0.5)
    assert len(out) == 64 * 64 * 4
    arr = np.frombuffer(out, np.uint8).reshape(64, 64, 4)
    assert np.all(arr[..., 0] == 128) and np.all(arr[..., 2] == 128)
    assert interp.get_last_gpu_duration_ms() is not None
    assert interp.get_last_gpu_duration_ms() >= 0.0


def test_interpolator_size_validation():
    interp = nsc.WgpuFrameInterpolator()
    with pytest.raises(ValueError, match="Expected 16384 bytes per frame"):
        interp.interpolate_py(b"\x00" * 100, b"\x00" * 16384, 64, 64)


def test_interpolator_presets():
    assert nsc.WgpuFrameInterpolator("16x16").workgroup_preset == (16, 16)
    assert nsc.WgpuFrameInterpolator("wide").workgroup_preset == (32, 8)
    assert nsc.WgpuFrameInterpolator("bogus").workgroup_preset == (32, 8)  # default
    assert nsc.WgpuFrameInterpolator().workgroup_preset == (32, 8)


def test_interpolator_flow_mode():
    interp = nsc.WgpuFrameInterpolator(mode="flow")
    a = np.random.default_rng(0).integers(0, 256, (32, 32, 4), np.uint8)
    b = np.roll(a, 2, axis=1)
    out = interp.interpolate_py(a.tobytes(), b.tobytes(), 32, 32)
    assert len(out) == 32 * 32 * 4


def test_constants_usable_as_ctor_args():
    up = nsc.PyWgpuUpscaler(nsc.QUALITY_ULTRA, "bilinear")
    assert up._quality == nsc.UpscalingQuality.ULTRA


def test_advanced_ultra_learned_tier(pattern):
    """create_advanced_upscaler('ultra') serves the learned ESRGAN tier when
    a trained checkpoint exists (BASELINE north star)."""
    up = nsc.create_advanced_upscaler("ultra")
    up.initialize(32, 32, 64, 64)
    out = up.upscale(pattern(32, 32).tobytes())
    assert len(out) == 64 * 64 * 4
    outs = up.upscale_batch([pattern(32, 32).tobytes()] * 2)
    assert len(outs) == 2 and outs[0] == out


def test_reload_shader_is_per_instance(pattern):
    """VERDICT r1 #8: one instance's reload must not clobber another's
    compiled kernel (round 1 cleared the process-global LRU)."""
    u1 = nsc.PyWgpuUpscaler("quality", "bilinear")
    u2 = nsc.PyWgpuUpscaler("quality", "bilinear")
    u1.initialize(32, 24, 64, 48)
    u2.initialize(32, 24, 64, 48)
    fn2_before = u2._fn
    assert u1._fn is u2._fn  # same LRU entry
    u1.reload_shader("dummy.wgsl")
    assert u2._fn is fn2_before  # untouched
    assert u1._fn is not fn2_before  # actually rebuilt
    out = u1.upscale(pattern(32, 24).tobytes())
    assert out == u2.upscale(pattern(32, 24).tobytes())


def test_reload_shader_keeps_fsr_kernel(pattern):
    fsr = nsc.create_fsr_upscaler("quality")
    fsr.initialize(32, 24, 64, 48)
    before = fsr.upscale(pattern(32, 24).tobytes())
    fsr.reload_shader("dummy.wgsl")
    assert fsr.upscale(pattern(32, 24).tobytes()) == before


def test_interpolator_device_true_timing():
    """Duration APIs: calibrated device time + per-stage detail dict
    (TIMESTAMP_QUERY parity, wgpu_interpolator.rs:389-438)."""
    interp = nsc.WgpuFrameInterpolator()
    assert interp.get_last_gpu_duration_ms() is None
    assert interp.get_last_gpu_duration_detail() is None
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (16, 16, 4), np.uint8)
    b = rng.integers(0, 256, (16, 16, 4), np.uint8)
    interp.interpolate_py(a.tobytes(), b.tobytes(), 16, 16)
    ms = interp.get_last_gpu_duration_ms()
    assert ms is not None and 0.0 < ms < 1e4
    detail = interp.get_last_gpu_duration_detail()
    assert detail["total_ms"] > 0 and "blend_ms" in detail and "wall_ms" in detail


def test_interpolator_flow_stage_timings():
    from nu_scaler_tpu.ops import interpolate as interp_ops

    d = interp_ops.stage_timings_ms(32, 32, "flow", iters=2)
    assert d["total_ms"] > 0 and d["flow_ms"] > 0 and d["warp_ms"] > 0


def test_flow_soft_stage_timings_time_the_soft_pipeline(monkeypatch):
    """VERDICT r2 #3: stage_timings_ms('flow_soft') must time the fast flow
    + overlapped soft warp (the pipeline flow_soft actually runs), not the
    exact per-pixel path. The exact-path entry points are poisoned, so any
    regression to them raises; the stage sum must also land in the same
    ballpark as the calibrated total (they previously couldn't: the exact
    flow alone dwarfs the soft pipeline)."""
    from nu_scaler_tpu.ops import interpolate as interp_ops

    def _boom(*a, **k):  # pragma: no cover - only fires on regression
        raise AssertionError("flow_soft stage timing used the exact path")

    monkeypatch.setattr(interp_ops, "compute_flow", _boom)
    monkeypatch.setattr(interp_ops, "warp_blend", _boom)
    d = interp_ops.stage_timings_ms.__wrapped__(
        16, 32, "flow_soft", interp_ops.WARP_TILE, 3
    )
    assert d["flow_ms"] > 0 and d["warp_ms"] > 0
    total = interp_ops.calibrated_step_ms(16, 32, "flow_soft", iters=3)
    ratio = (d["flow_ms"] + d["warp_ms"]) / total
    assert 0.2 < ratio < 5.0, f"stage sum {ratio:.2f}x off the total"


def test_adaptive_downgrade_swaps_serving_tier(pattern, monkeypatch):
    """VERDICT r2 #6: pressure-triggered tier change must rebuild the serving
    kernel — a downgraded ULTRA instance swaps learned → classical on the
    next upscale(), and upgrades back (never beyond the requested tier) when
    pressure clears."""
    import types

    up = nsc.create_advanced_upscaler("ultra")
    up.initialize(32, 32, 64, 64)
    assert up._serving_tier == "learned"
    learned_fn = up._fn

    fake = types.SimpleNamespace(
        usage_percent=95.0, total_mb=100.0, used_mb=95.0, free_mb=5.0,
        app_allocated_mb=0.0,
    )
    monkeypatch.setattr(up._pool, "get_vram_stats", lambda: fake)
    up.upscale(pattern(32, 32).tobytes())
    assert up.get_quality_str() == "quality"
    assert up._serving_tier == "classical"
    assert up._fn is not learned_fn
    # the next dispatch runs the cheap tier
    out = up.upscale(pattern(32, 32).tobytes())
    assert len(out) == 64 * 64 * 4
    assert up.get_quality_str() == "balanced"  # still under pressure: one more step

    fake.usage_percent = 30.0
    fake.used_mb = 30.0
    up.upscale(pattern(32, 32).tobytes())  # balanced -> quality
    up.upscale(pattern(32, 32).tobytes())  # quality -> ultra (the requested tier)
    assert up.get_quality_str() == "ultra"
    assert up._serving_tier == "learned"
    up.upscale(pattern(32, 32).tobytes())
    assert up.get_quality_str() == "ultra"  # never beyond the requested tier


def test_adaptive_upgrade_capped_at_requested(pattern, monkeypatch):
    import types

    up = nsc.PyAdvancedWgpuUpscaler("balanced", "bilinear", True)
    up.initialize(16, 16, 32, 32)
    fake = types.SimpleNamespace(
        usage_percent=20.0, total_mb=100.0, used_mb=20.0, free_mb=80.0,
        app_allocated_mb=0.0,
    )
    monkeypatch.setattr(up._pool, "get_vram_stats", lambda: fake)
    up.upscale(pattern(16, 16).tobytes())
    assert up.get_quality_str() == "balanced"  # low pressure, but already at request


def test_workgroup_preset_wired_to_warp_tile():
    """VERDICT r1 missing #5: the preset must actually affect the compiled
    flow pipeline (it maps to the warp pass's block shape)."""
    from nu_scaler_tpu.ops import interpolate as interp_ops

    wide = nsc.WgpuFrameInterpolator("wide", mode="flow")
    tall = nsc.WgpuFrameInterpolator("tall", mode="flow")
    assert wide.warp_tile == (8, 128)  # default preset == measured-optimal tile
    assert tall.warp_tile == (32, 32)
    f_wide = interp_ops.make_interpolator(32, 64, "flow", warp_tile=wide.warp_tile)
    f_tall = interp_ops.make_interpolator(32, 64, "flow", warp_tile=tall.warp_tile)
    assert f_wide is not f_tall  # distinct compiled pipelines
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (32, 64, 4), np.uint8)
    b = np.roll(a, 3, axis=1)
    out_w = wide.interpolate_py(a.tobytes(), b.tobytes(), 64, 32)
    out_t = tall.interpolate_py(a.tobytes(), b.tobytes(), 64, 32)
    assert len(out_w) == len(out_t) == 64 * 32 * 4


def test_nuscaler_facade(monkeypatch):
    """NuScaler facade parity (lib.rs:856-987): auto-tech construction,
    one-shot capture_and_upscale, quality setter, error on no frame."""
    ns = nsc.NuScaler()  # auto tech ("wgpu" on accelerators, "fallback" CPU)
    assert ns.technology in ("wgpu", "fallback")
    assert ns.get_upscaler_name()
    ns2 = nsc.NuScaler.with_technology("fsr", "quality")
    assert ns2.get_upscaler_name() == "FsrUpscaler"
    # synthetic capture target so get_frame always yields
    from nu_scaler_core.capture import PyCaptureTarget

    ns2.set_capture_target(PyCaptureTarget.FullScreen)
    import nu_scaler_core.capture as cap_mod

    # probe the fullscreen source size with a polling drain
    import time

    ns2.capture.start(PyCaptureTarget.FullScreen)
    got = None
    # generous deadline: the fullscreen source's first frame needs a jit
    # compile, and loaded CI hosts have starved a 2 s budget before
    deadline = time.monotonic() + 60.0
    while got is None and time.monotonic() < deadline:
        got = ns2.capture.get_frame()
        time.sleep(0.01)
    ns2.capture.stop()
    assert got is not None
    _, w, h = got
    try:
        out = ns2.capture_and_upscale(w, h, w * 2, h * 2)
        assert len(out) == w * 2 * h * 2 * 4
        with pytest.raises(RuntimeError, match="Captured frame is"):
            ns2.capture_and_upscale(w + 2, h, w * 2, h * 2)
    finally:
        ns2.close()
    ns2.set_quality("performance")
    assert ns2.quality == "performance"


def test_advanced_learned_batch_ragged_dp(pattern):
    """Learned-tier upscale_batch rides ONE batched device program (vmapped
    fused graph; dp-sharded over the mesh when devices > 1 —
    mesh.esrgan_batch_sharded pads ragged batches). 3 frames on the 8-dev
    CPU mesh exercises the pad path; per-frame outputs must match
    single-frame serving."""
    up = nsc.create_advanced_upscaler("ultra")
    up.initialize(32, 32, 64, 64)
    assert up._serving_tier == "learned"
    frames = [pattern(32, 32).tobytes(),
              np.roll(pattern(32, 32), 5, axis=1).tobytes(),
              np.roll(pattern(32, 32), 11, axis=0).tobytes()]
    outs = up.upscale_batch(frames)
    assert len(outs) == 3
    for f, o in zip(frames, outs):
        single = up.upscale(f)
        a = np.frombuffer(o, np.uint8).astype(np.int32)
        b = np.frombuffer(single, np.uint8).astype(np.int32)
        assert np.abs(a - b).max() <= 1
