"""Edge cases and odd shapes through the public API."""

import numpy as np
import pytest

import nu_scaler_core as nsc
from nu_scaler_tpu.ops import resample
from nu_scaler_tpu.ops.metrics import psnr
from nu_scaler_tpu.kernels import reference as ref


@pytest.mark.parametrize(
    "ih,iw,oh,ow",
    [
        (7, 9, 13, 17),      # primes, non-tiling scale
        (1, 1, 4, 4),        # degenerate single pixel
        (33, 1920, 66, 3840),  # wide strip
        (64, 64, 63, 63),    # slight downscale
    ],
)
def test_odd_shapes_all_algorithms(rng, ih, iw, oh, ow):
    img = rng.integers(0, 256, (ih, iw, 4), np.uint8)
    for algo in ["nearest", "bilinear", "lanczos3", "area"]:
        out = np.asarray(resample.upscale_frame(img, oh, ow, algo))
        assert out.shape == (oh, ow, 4)
        if algo == "nearest":
            np.testing.assert_array_equal(out, ref.nearest_ref(img, oh, ow))


def test_facade_odd_size_roundtrip(rng):
    up = nsc.PyWgpuUpscaler("quality", "lanczos2")
    up.initialize(37, 53, 91, 119)
    data = rng.integers(0, 256, (53, 37, 4), np.uint8).tobytes()  # h=53? no:
    # initialize(input_width=37, input_height=53) → frame is 53 rows x 37 cols
    out = up.upscale(data)
    assert len(out) == 91 * 119 * 4


def test_interpolator_tiny_frames(rng):
    interp = nsc.WgpuFrameInterpolator()
    a = rng.integers(0, 256, (2, 2, 4), np.uint8)
    b = rng.integers(0, 256, (2, 2, 4), np.uint8)
    out = interp.interpolate_py(a.tobytes(), b.tobytes(), 2, 2)
    assert len(out) == 2 * 2 * 4


def test_flow_mode_tiny_frames(rng):
    """The full flow pipeline must survive frames smaller than one pyramid
    level / warp tile."""
    from nu_scaler_tpu.ops import interpolate as I

    a = rng.integers(0, 256, (12, 20, 4), np.uint8)
    b = rng.integers(0, 256, (12, 20, 4), np.uint8)
    out = np.asarray(I.interpolate_frames(a, b, 0.5, mode="flow"))
    assert out.shape == (12, 20, 4)


def test_flow_soft_tiny_and_odd_frames(rng):
    """The overlapped-tile warp (aligned P/Q accumulators, half-tile shifted
    fields) must survive frames smaller than a warp tile and odd shapes."""
    from nu_scaler_tpu.ops import interpolate as I

    for h, w in ((12, 20), (7, 13), (33, 65), (8, 128)):
        a = rng.integers(0, 256, (h, w, 4), np.uint8)
        a[..., 3] = 255
        b = np.roll(a, 2, axis=1)
        out = np.asarray(I.interpolate_frames(a, b, 0.5, mode="flow_soft"))
        assert out.shape == (h, w, 4), (h, w)
        assert out[..., 3].min() == 255  # alpha cross-fade of 255s stays 255


def test_soft_warp_uniform_shift_recovers_image(rng):
    """A uniform integer shift must be recovered (near-)exactly by the soft
    warp away from edges — the bf16 accumulate may cost ~1 LSB."""
    from nu_scaler_tpu.ops import interpolate as I
    import jax.numpy as jnp

    img = jnp.asarray(rng.integers(0, 256, (3, 48, 160), np.uint8), jnp.float32)
    off = np.zeros((48, 160, 2), np.float32)
    off[..., 0] = 5.0  # +5 px in x
    out = np.asarray(I.block_warp_planar(img, jnp.asarray(off), overlap=True))
    ref = np.asarray(img)[:, :, 5:]
    err = np.abs(out[:, :, :-5] - ref[:, :, : out.shape[2] - 5]).max()
    assert err <= 2.0, err


def test_capture_restart_cycles():
    cap = nsc.PyScreenCapture()
    for _ in range(3):
        cap.start(nsc.PyCaptureTarget.FullScreen)
        cap.stop()
    assert cap.get_frame() is None


def test_reinitialize_changes_shape(pattern):
    up = nsc.PyWgpuUpscaler("quality", "bilinear")
    up.initialize(16, 16, 32, 32)
    assert len(up.upscale(pattern(16, 16).tobytes())) == 32 * 32 * 4
    up.initialize(24, 24, 48, 48)
    assert len(up.upscale(pattern(24, 24).tobytes())) == 48 * 48 * 4


def test_time_t_extremes(rng):
    a = rng.integers(0, 256, (8, 8, 4), np.uint8)
    b = rng.integers(0, 256, (8, 8, 4), np.uint8)
    interp = nsc.WgpuFrameInterpolator()
    out0 = np.frombuffer(interp.interpolate_py(a.tobytes(), b.tobytes(), 8, 8, time_t=0.0), np.uint8)
    out1 = np.frombuffer(interp.interpolate_py(a.tobytes(), b.tobytes(), 8, 8, time_t=1.0), np.uint8)
    np.testing.assert_array_equal(out0.reshape(8, 8, 4), a)
    np.testing.assert_array_equal(out1.reshape(8, 8, 4), b)


def test_large_motion_recovery():
    """Block warp honors motion beyond one tile (WARP_RANGE=48)."""
    from nu_scaler_tpu.ops import interpolate as I
    import jax.numpy as jnp

    img = np.zeros((64, 256, 1), np.float32)
    img[:, 100:110] = 1.0
    off = np.tile(np.array([40.0, 0.0], np.float32), (64, 256, 1))
    out = np.asarray(I.block_warp(jnp.asarray(img), jnp.asarray(off)))
    # content shifted left by 40 (sample at x+40)
    assert out[32, 60:70].mean() > 0.9
    assert out[32, 100:110].mean() < 0.1
