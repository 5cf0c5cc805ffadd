"""Batch Y4M→Y4M transcode (nu_scaler/transcode.py): frame accounting,
header correctness, upscale fidelity through the 420 container, and the
motion-interpolated factor path."""

import numpy as np
import pytest

from nu_scaler_tpu.bench.harness import generate_test_pattern
from nu_scaler_tpu.capture.video import Y4MReader, Y4MWriter, _rgba_to_yuv420, _yuv420_to_rgba
from nu_scaler_tpu.ops.metrics import psnr

from nu_scaler.transcode import transcode


def _write_clip(path, frames, fps=30):
    w = Y4MWriter(path, frames[0].shape[1], frames[0].shape[0], fps=fps)
    for f in frames:
        w.write(f)
    w.close()


def _moving_clip(n=4, h=32, w=48):
    base = generate_test_pattern(w, h)
    base[8:16, 8:16, :3] = 255
    return [np.roll(base, 2 * i, axis=1) for i in range(n)]


def test_transcode_upscale_only(tmp_path):
    src = str(tmp_path / "in.y4m")
    dst = str(tmp_path / "out.y4m")
    frames = _moving_clip(4)
    _write_clip(src, frames, fps=24)

    stats = transcode(src, dst, scale=2.0, algorithm="bilinear", factor=1)
    assert stats["frames_in"] == 4 and stats["frames_out"] == 4
    assert stats["out_size"] == (96, 64)
    assert stats["out_fps"] == pytest.approx(24.0)

    r = Y4MReader(dst)
    assert (r.width, r.height) == (96, 64)
    assert r.fps == pytest.approx(24.0)
    out_frames = list(r)
    r.close()
    assert len(out_frames) == 4

    # fidelity: first output frame ≈ the upscaler applied directly, compared
    # through the same 420 container roundtrip the file imposes
    import jax.numpy as jnp

    import nu_scaler_core

    up = nu_scaler_core.PyWgpuUpscaler("quality", "bilinear")
    up.initialize(48, 32, 96, 64)
    # the reader itself 420-decodes the input: feed the DECODED frame
    rin = Y4MReader(src)
    dec0 = next(rin)
    rin.close()
    ref = np.frombuffer(up.upscale(dec0.tobytes()), np.uint8).reshape(64, 96, 4)
    ref_rt = _yuv420_to_rgba(*_rgba_to_yuv420(ref))
    assert psnr(out_frames[0][..., :3], ref_rt[..., :3]) >= 45.0


def test_transcode_factor_2_flow(tmp_path):
    src = str(tmp_path / "in.y4m")
    dst = str(tmp_path / "out.y4m")
    frames = _moving_clip(3)
    _write_clip(src, frames, fps=30)

    stats = transcode(
        src, dst, scale=2.0, algorithm="bilinear", factor=2, interp_mode="blend"
    )
    # N·(n−1) + 1 output frames, fps × N
    assert stats["frames_in"] == 3 and stats["frames_out"] == 5
    assert stats["out_fps"] == pytest.approx(60.0)

    r = Y4MReader(dst)
    assert r.fps == pytest.approx(60.0)
    out_frames = list(r)
    r.close()
    assert len(out_frames) == 5
    # the inserted mid must sit between its neighbors (cross-fade check)
    a, m, b = (f[..., :3].astype(np.float64) for f in out_frames[:3])
    assert np.abs(m - (a + b) / 2).mean() < np.abs(a - b).mean()


def test_transcode_limit_and_validation(tmp_path):
    src = str(tmp_path / "in.y4m")
    dst = str(tmp_path / "out.y4m")
    _write_clip(src, _moving_clip(5), fps=30)
    stats = transcode(src, dst, scale=2.0, algorithm="nearest", limit=2)
    assert stats["frames_in"] == 2 and stats["frames_out"] == 2
    with pytest.raises(ValueError):
        transcode(src, dst, factor=0)


def test_transcode_cli(tmp_path):
    from nu_scaler.transcode import main

    src = str(tmp_path / "in.y4m")
    dst = str(tmp_path / "out.y4m")
    _write_clip(src, _moving_clip(3), fps=30)
    rc = main([src, dst, "--scale", "2", "--algorithm", "bilinear",
               "--limit", "2"])
    assert rc == 0
    r = Y4MReader(dst)
    assert len(list(r)) == 2
    r.close()


def test_transcode_batched_matches_single(tmp_path):
    """--batch N groups frames into one device program per dispatch; the
    output file must match the batch=1 run bit-for-bit (the classical
    resampler body is batch-polymorphic — same program, stacked)."""
    src = str(tmp_path / "in.y4m")
    d1 = str(tmp_path / "out1.y4m")
    d2 = str(tmp_path / "out2.y4m")
    _write_clip(src, _moving_clip(5), fps=30)

    s1 = transcode(src, d1, scale=2.0, algorithm="lanczos3", factor=1)
    s2 = transcode(src, d2, scale=2.0, algorithm="lanczos3", factor=1, batch=2)
    assert s1["frames_out"] == s2["frames_out"] == 5
    assert s2["batch"] == 2

    r1, r2 = Y4MReader(d1), Y4MReader(d2)
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a, b)
    r1.close()
    r2.close()


def test_transcode_batched_factor_pads_final_group(tmp_path):
    """factor=2 over 3 inputs emits 5 frames: batch=2 leaves a final short
    group (pad-to-batch path) and must still write all 5 in order."""
    src = str(tmp_path / "in.y4m")
    d1 = str(tmp_path / "out1.y4m")
    d2 = str(tmp_path / "out2.y4m")
    _write_clip(src, _moving_clip(3), fps=30)

    kw = dict(scale=2.0, algorithm="bilinear", factor=2, interp_mode="blend")
    s1 = transcode(src, d1, **kw)
    s2 = transcode(src, d2, batch=2, **kw)
    assert s1["frames_out"] == s2["frames_out"] == 5

    r1, r2 = Y4MReader(d1), Y4MReader(d2)
    f1, f2 = list(r1), list(r2)
    r1.close()
    r2.close()
    assert len(f2) == 5
    for a, b in zip(f1, f2):
        np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError):
        transcode(src, d1, batch=0)
