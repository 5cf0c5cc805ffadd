"""Legacy UpscalingTechnology registry — enum parity, real support probes,
and the reference's exact fallback chains (Nu_scale/src/upscale/mod.rs:24-45,
:92-270)."""

import numpy as np
import pytest

from nu_scaler_core import technologies as tech


def test_enum_parity():
    # mod.rs:24-45 — every reference enum arm is representable
    for name in ("none", "fsr", "fsr3", "dlss", "xess", "nis", "cuda",
                 "vulkan", "gpu", "fallback"):
        assert name in tech.TECHNOLOGIES


def test_quality_to_algorithm_map():
    # mod.rs:275-282
    assert tech._quality_to_algorithm("ultra") == "lanczos3"
    assert tech._quality_to_algorithm("quality") == "bicubic"
    assert tech._quality_to_algorithm("balanced") == "bicubic"
    assert tech._quality_to_algorithm("performance") == "bilinear"


def test_is_supported_probes_are_real():
    # classical tiers need a backend (present on the CPU mesh)
    assert tech.is_supported("fsr")
    assert tech.is_supported("fallback")
    assert tech.is_supported("none")
    # learned tiers need committed checkpoints — which exist in this repo
    assert tech.is_supported("dlss")
    assert tech.is_supported("xess")
    assert not tech.is_supported("not-a-tech")


def test_passthrough_clones_input():
    up = tech.create_upscaler("none")
    assert up.name == "Pass-through"
    up.initialize(8, 6, 999, 999)  # output dims ignored (common.rs:17-20)
    data = bytes(range(8 * 6 * 4 // 8)) * 8
    assert up.upscale(data) == data
    assert not up.needs_initialization()


def test_fallback_uses_quality_algorithm():
    up = tech.create_upscaler("fallback", "ultra")
    assert up.algorithm == "lanczos3"
    up2 = tech.create_upscaler("fallback", "performance")
    assert up2.algorithm == "bilinear"
    # explicit algorithm overrides the quality map (mod.rs:264-270)
    up3 = tech.create_upscaler("fallback", "ultra", algorithm="nearest")
    assert up3.algorithm == "nearest"


def test_nis_upscaler_runs_and_sharpens():
    up = tech.create_upscaler("nis", "balanced")
    assert up.name == "NISUpscaler"
    up.initialize(16, 12, 32, 24)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (12, 16, 4), np.uint8)
    out = np.frombuffer(up.upscale(frame.tobytes()), np.uint8).reshape(24, 32, 4)
    # sanity: result differs from the plain resample (RCAS did something)
    from nu_scaler_tpu.ops import resample

    plain = np.asarray(resample.make_resampler(12, 16, 24, 32, "bicubic")(frame))
    assert out.shape == plain.shape
    assert not np.array_equal(out, plain)
    # RGB only: the FSR/NIS path emits α≡255 (ops/fsr.py — the capture
    # path's frames are α≡255), while plain bicubic resamples the random α
    assert np.all(out[..., 3] == 255)
    assert abs(
        out[..., :3].astype(np.int32).mean() - plain[..., :3].astype(np.int32).mean()
    ) < 8


def test_xess_serves_learned_performance_tier():
    up = tech.create_upscaler("xess", "balanced")
    # xess.rs's mock served nearest-neighbour; here it's the real stride-8
    # learned ladder via the advanced upscaler
    assert getattr(up, "learned_prefer", None) == "performance"


def test_dlss_serves_learned_quality_tier():
    from nu_scaler_core import PyAdvancedWgpuUpscaler

    up = tech.create_upscaler("dlss", "ultra")
    # the DLSS arm serves the learned tier via the advanced upscaler at the
    # quality checkpoint (learned_prefer unset → quality ladder)
    assert isinstance(up, PyAdvancedWgpuUpscaler)
    assert getattr(up, "learned_prefer", None) is None


def test_unimplemented_arms_fall_back_to_fsr():
    # mod.rs:99-119 (gpu), :197-216 (cuda): FSR is the first fallback
    for t in ("cuda", "gpu"):
        up = tech.create_upscaler(t, "quality")
        assert up.name == "FsrUpscaler", t
    # vulkan's supported arm serves the classical path (mod.rs:240-246)
    up = tech.create_upscaler("vulkan", "quality")
    assert up.name == "WgpuUpscaler"


def test_fsr3_is_fsr_pipeline():
    up = tech.create_upscaler("fsr3", "quality")
    assert up.name == "FsrUpscaler"


def test_unknown_technology_raises():
    with pytest.raises(ValueError, match="Unknown upscaling technology"):
        tech.create_upscaler("hypercale")


def test_facade_routes_legacy_techs():
    from nu_scaler_core.facade import _create_upscaler

    assert _create_upscaler("nis", "balanced").name == "NISUpscaler"
    assert _create_upscaler("none", "ultra").name == "Pass-through"
    assert _create_upscaler("xess", "balanced").learned_prefer == "performance"


def test_upscale_image_file_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    src = tmp_path / "in.png"
    dst = tmp_path / "out.png"
    Image.fromarray(rng.integers(0, 256, (12, 16, 4), np.uint8), "RGBA").save(src)
    w, h = tech.upscale_image_file(str(src), str(dst), "fallback", "performance", 2.0)
    assert (w, h) == (32, 24)
    out = np.asarray(Image.open(dst))
    assert out.shape == (24, 32, 4)
