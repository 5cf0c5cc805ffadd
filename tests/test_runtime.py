"""Runtime services: detector, memory pool, pressure thresholds."""

import nu_scaler_core as nsc
from nu_scaler_tpu.runtime import (
    AllocationStrategy,
    DeviceDetector,
    MemoryPool,
    MemoryPressure,
)


def test_detector_finds_devices():
    d = DeviceDetector()
    devices = d.detect_gpus()
    assert devices, "no devices detected"
    primary = d.get_primary_gpu()
    assert primary is not None
    assert primary.backend == "XLA"
    info = primary.as_dict()
    assert info["vendor_id"].startswith("0x")


def test_tech_selection():
    d = DeviceDetector()
    d.detect_gpus()
    tech = d.determine_best_upscaling_technology()
    # CPU test backend → fallback; on real TPU → wgpu
    assert tech in ("wgpu", "fallback")


def test_memory_pressure_thresholds():
    """memory.rs:328-341 exact boundaries."""
    assert MemoryPressure.from_percent(0) is MemoryPressure.LOW
    assert MemoryPressure.from_percent(49.9) is MemoryPressure.LOW
    assert MemoryPressure.from_percent(50.0) is MemoryPressure.MEDIUM
    assert MemoryPressure.from_percent(74.9) is MemoryPressure.MEDIUM
    assert MemoryPressure.from_percent(75.0) is MemoryPressure.HIGH
    assert MemoryPressure.from_percent(89.9) is MemoryPressure.HIGH
    assert MemoryPressure.from_percent(90.0) is MemoryPressure.CRITICAL


def test_strategy_parse():
    assert AllocationStrategy.parse("aggressive") is AllocationStrategy.AGGRESSIVE
    assert AllocationStrategy.parse("MINIMAL") is AllocationStrategy.MINIMAL
    assert AllocationStrategy.parse("bogus") is AllocationStrategy.BALANCED  # silent default
    assert AllocationStrategy.AGGRESSIVE.buffers_in_flight == 3
    assert AllocationStrategy.MINIMAL.buffers_in_flight == 1


def test_memory_pool_stats():
    pool = MemoryPool()
    stats = pool.get_vram_stats()
    assert stats.total_mb > 0
    assert stats.free_mb >= 0
    assert 0 <= stats.usage_percent <= 100
    pool.note_alloc(1024 * 1024)
    assert pool.get_allocated_bytes() >= 1024 * 1024
    assert pool.get_allocated_buffers_count() >= 1
    pool.cleanup_memory()
    assert pool.get_allocated_bytes() == 0


def test_memory_pool_wake():
    pool = MemoryPool()
    pool.force_gpu_usage()  # must not raise


def test_vram_stats_facade():
    s = nsc.PyVramStats(1000.0, 250.0, 750.0, 100.0)
    assert s.usage_percent == 25.0
    z = nsc.PyVramStats(0.0, 0.0, 0.0, 0.0)
    assert z.usage_percent == 0.0


def test_detect_technologies():
    """The legacy library-detection mocks' role (dlss.rs/xess.rs/vulkan.rs):
    availability map keyed by technology string."""
    from nu_scaler_tpu.runtime.detector import DeviceDetector

    d = DeviceDetector()
    d.detect_gpus()
    techs = d.detect_technologies()
    assert techs["wgpu"] and techs["fsr"] and techs["fallback"]
    assert techs["xess"] is False and techs["vulkan"] is False
    assert isinstance(techs["dlss"], bool)  # true iff a checkpoint exists
