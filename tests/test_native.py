"""Native C++ frame-ring runtime."""

import numpy as np
import pytest

from nu_scaler_tpu.runtime import framering as fr


@pytest.fixture(scope="module")
def native():
    if not fr.native_available():
        pytest.skip("no native toolchain")
    return True


def test_native_builds(native):
    assert fr.native_available()


def test_native_ring_semantics(native):
    ring = fr.NativeFrameRing(capacity=3, max_frame_bytes=64 * 64 * 4)
    assert ring.latest() is None
    for i in range(5):
        frame = np.full((8, 8, 4), i, np.uint8)
        ring.push_array(frame)
    assert ring.frames_pushed == 5
    assert ring.frames_dropped == 2
    got = ring.latest()
    assert got is not None
    data, w, h = got
    assert (w, h) == (8, 8)
    assert np.frombuffer(data, np.uint8)[0] == 4  # newest frame
    assert ring.latest() is None  # drained


def test_native_bgra_swizzle(native, rng):
    bgra = rng.integers(0, 256, (16, 16, 4), np.uint8)
    rgba = fr.bgra_to_rgba(bgra)
    np.testing.assert_array_equal(rgba, bgra[..., [2, 1, 0, 3]])


def test_native_test_pattern_matches_python(native):
    from nu_scaler_tpu.bench.harness import generate_test_pattern

    native_img = fr.native_test_pattern(64, 32, tick=0)
    py_img = generate_test_pattern(64, 32)
    # the native pattern adds the moving square; compare outside it
    assert native_img.shape == py_img.shape
    np.testing.assert_array_equal(native_img[:10], py_img[:10])


def test_python_fallback_swizzle(rng, monkeypatch):
    monkeypatch.setattr(fr, "_lib", None)
    monkeypatch.setattr(fr, "_lib_err", "forced")
    bgra = rng.integers(0, 256, (4, 4, 4), np.uint8)
    rgba = fr.bgra_to_rgba(bgra)
    np.testing.assert_array_equal(rgba, bgra[..., [2, 1, 0, 3]])


def test_native_y4m_matches_python_reader(tmp_path):
    """The C++ demuxer must agree with the pure-Python reader (≤1 LSB from
    float-precision ordering in the YUV→RGB math)."""
    import pytest

    from nu_scaler_tpu.capture import video as V

    if not V.native_y4m_available():
        pytest.skip("no compiler for the native demuxer")
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (48, 64, 4), np.uint8) for _ in range(3)]
    path = str(tmp_path / "clip.y4m")
    w = V.Y4MWriter(path, 64, 48, fps=24.0)
    for f in frames:
        w.write(f)
    w.close()

    nat = V.NativeY4MReader(path)
    assert (nat.width, nat.height) == (64, 48)
    assert abs(nat.fps - 24.0) < 1e-6
    py = list(V.Y4MReader(path))
    got = list(nat)
    assert len(got) == len(py) == 3
    for a, b in zip(got, py):
        diff = np.abs(a.astype(np.int16) - b.astype(np.int16)).max()
        assert diff <= 1, diff
    # rewind support (the Python reader has no equivalent)
    nat.rewind()
    again = next(nat)
    np.testing.assert_array_equal(again, got[0])
    nat.close()
    assert V.open_reader(path).__class__.__name__ == "NativeY4MReader"
    assert V.open_reader(path, native="python").__class__.__name__ == "Y4MReader"
