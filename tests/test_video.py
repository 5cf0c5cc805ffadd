"""Y4M video I/O roundtrip."""

import numpy as np

from nu_scaler_tpu.capture.video import VideoSource, Y4MReader, Y4MWriter


def test_y4m_roundtrip(tmp_path, rng):
    path = str(tmp_path / "clip.y4m")
    frames = [rng.integers(0, 256, (32, 48, 4), np.uint8) for _ in range(5)]
    for f in frames:
        f[..., 3] = 255
    w = Y4MWriter(path, 48, 32, fps=30)
    for f in frames:
        w.write(f)
    w.close()

    r = Y4MReader(path)
    assert (r.width, r.height) == (48, 32)
    assert abs(r.fps - 30.0) < 1e-6
    decoded = list(r)
    r.close()
    assert len(decoded) == 5
    for orig, dec in zip(frames, decoded):
        # YUV420 is lossy (chroma subsampling); luma must survive closely
        lum_o = orig[..., :3].astype(np.float64).mean()
        lum_d = dec[..., :3].astype(np.float64).mean()
        assert abs(lum_o - lum_d) < 4.0
        assert dec.shape == (32, 48, 4)


def test_video_source_loops(tmp_path):
    path = str(tmp_path / "short.y4m")
    w = Y4MWriter(path, 16, 16, fps=24)
    for i in range(3):
        w.write(np.full((16, 16, 4), i * 50, np.uint8))
    w.close()
    src = VideoSource(path)
    got = [src.next_frame() for _ in range(7)]  # loops past EOF
    assert len(got) == 7
    assert got[0].shape == (16, 16, 4)
    src.close()


def test_y4m_smooth_color_fidelity(tmp_path):
    """Smooth gradients survive 420 round trip within a few steps."""
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.ops.metrics import psnr

    img = generate_test_pattern(64, 32)
    path = str(tmp_path / "grad.y4m")
    w = Y4MWriter(path, 64, 32)
    w.write(img)
    w.close()
    dec = next(iter(Y4MReader(path)))
    assert psnr(dec, img) > 30.0


def test_capture_video_target(tmp_path):
    """PyScreenCapture plays a clip via the window-title scheme."""
    import time

    import nu_scaler_core as nsc

    path = str(tmp_path / "clip.y4m")
    w = Y4MWriter(path, 32, 16, fps=60)
    for i in range(4):
        w.write(np.full((16, 32, 4), 40 * i, np.uint8))
    w.close()

    cap = nsc.PyScreenCapture()
    cap.start(nsc.PyCaptureTarget.WindowByTitle, nsc.PyWindowByTitle(f"video:{path}"))
    frame = None
    deadline = time.monotonic() + 10
    while frame is None and time.monotonic() < deadline:
        frame = cap.get_frame()
        time.sleep(0.01)
    cap.stop()
    assert frame is not None
    data, fw, fh = frame
    assert (fw, fh) == (32, 16)
