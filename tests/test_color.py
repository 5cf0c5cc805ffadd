"""On-device 4:2:0 ↔ RGBA conversion (ops/color.py) vs the numpy goldens in
capture/video.py, plus the LivePipeline ingest/deliver integration — the
transfer-minimal live-delivery path (VERDICT r3 #2).

The reference's live loop swizzled full BGRA on the CPU both ways
(/root/reference/nu_scaler_core/src/capture/realtime.rs:463-494); here the
conversions run on-device as banded matmuls so only 1.5 B/px crosses the link.
"""

import numpy as np
import pytest

from nu_scaler_tpu.capture.video import _rgba_to_yuv420, _yuv420_to_rgba
from nu_scaler_tpu.ops import color
from nu_scaler_tpu.ops.metrics import psnr

H, W = 64, 256


def _frame(seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    f = rng.integers(0, 256, (H, W, 4), np.uint8)
    f[..., 3] = 255
    return f


def _smooth_frame() -> np.ndarray:
    """Gradient frame whose YUV stays inside the gamut (random-noise RGBA
    clips heavily on 4:2:0 reconstruction — not the signal of interest)."""
    yy, xx = np.mgrid[0:H, 0:W]
    f = np.empty((H, W, 4), np.uint8)
    f[..., 0] = (64 + 128 * xx / W).astype(np.uint8)
    f[..., 1] = (64 + 128 * yy / H).astype(np.uint8)
    f[..., 2] = (64 + 64 * (xx + yy) / (W + H)).astype(np.uint8)
    f[..., 3] = 255
    return f


def test_yuv420_to_rgba_matches_golden():
    y, u, v = _rgba_to_yuv420(_frame())
    got = np.asarray(color.make_yuv420_to_rgba(H, W)(y, u, v))
    want = _yuv420_to_rgba(y, u, v)
    # f32 fma-association trunc ties only: ±1 LSB, tiny population
    assert got.shape == want.shape == (H, W, 4)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    assert psnr(got, want) >= 55.0


def test_rgba_to_yuv420_matches_golden():
    f = _frame(1)
    gy, gu, gv = _rgba_to_yuv420(f)
    dy, du, dv = (np.asarray(p) for p in color.make_rgba_to_yuv420(H, W)(f))
    assert dy.shape == (H, W) and du.shape == dv.shape == (H // 2, W // 2)
    assert np.abs(dy.astype(int) - gy.astype(int)).max() <= 1
    # chroma: golden clips per-pixel then means; device means exact-integer
    # RGB then applies the affine matrix (identical in real arithmetic away
    # from the clip rails — chroma spans [0.5, 255.5], so only the 255 rail
    # bites, by <= 0.5/4 per clipped sample, plus f32/trunc ties)
    assert np.abs(du.astype(int) - gu.astype(int)).max() <= 1
    assert np.abs(dv.astype(int) - gv.astype(int)).max() <= 1


def test_roundtrip_preserves_luma():
    f = _smooth_frame()
    y, u, v = (np.asarray(p) for p in color.make_rgba_to_yuv420(H, W)(f))
    back = np.asarray(color.make_yuv420_to_rgba(H, W)(y, u, v))
    # 4:2:0 halves chroma, so RGB is lossy — but on in-gamut content the
    # luma of the reconstruction must match the transmitted Y plane
    y2, _, _ = _rgba_to_yuv420(back)
    assert np.abs(y2.astype(int) - y.astype(int)).max() <= 2
    assert psnr(back, f) >= 40.0


def test_odd_dims_rejected():
    with pytest.raises(ValueError):
        color.make_yuv420_to_rgba(63, W)
    with pytest.raises(ValueError):
        color.make_rgba_to_yuv420(H, 255)


def test_delivery_fn_identity_and_formats():
    assert color.make_delivery_fn(H, W, "rgba", 0) is None  # no-op: skip it
    d = color.make_delivery_fn(H, W, "yuv420", 0)
    y, u, v = (np.asarray(p) for p in d(_frame(3)))
    assert y.shape == (H, W) and u.shape == (H // 2, W // 2)
    assert d.out_hw == (H, W)
    with pytest.raises(ValueError):
        color.make_delivery_fn(H, W, "nv12", 0)


def test_delivery_fn_preview_resolution():
    d = color.make_delivery_fn(H, W, "yuv420", preview_h=32)
    ph, pw = d.out_hw
    assert ph == 32 and pw == W // 2 and pw % 2 == 0
    y, u, v = (np.asarray(p) for p in d(_frame(4)))
    assert y.shape == (ph, pw) and u.shape == (ph // 2, pw // 2)
    # preview >= full height is a no-resample
    d2 = color.make_delivery_fn(H, W, "rgba", preview_h=H)
    assert d2 is None


def test_payload_bytes():
    assert color.payload_bytes("rgba", H, W) == H * W * 4
    assert color.payload_bytes("yuv420", H, W) == H * W * 3 // 2


def test_live_pipeline_planar_ingest_and_device_delivery():
    """End-to-end: 4:2:0 tuple in → device payloads out → fetch-on-present."""
    from nu_scaler_tpu.ops import interpolate as interp_ops
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.runtime.streaming import LivePipeline

    oh, ow = H * 2, W * 2
    up = resample.make_resampler(H, W, oh, ow, "bilinear")
    interp = interp_ops.make_interpolator(oh, ow, "blend")
    pipe = LivePipeline(
        up, lambda a, b, t: interp(a, b, t), depth=1, amortize_blend=True,
        ingest_fn=color.make_yuv420_to_rgba(H, W),
        deliver_fn=color.make_delivery_fn(oh, ow, "yuv420", 0),
    )
    outs = []
    for i in range(4):
        planes = _rgba_to_yuv420(_frame(10 + i))
        outs.extend(pipe.put_device(planes))
    outs.extend(pipe.drain_device())
    assert pipe.frames_out == len(outs) >= 5  # 4 in → ~2N-1 out at depth 1
    fetched = LivePipeline._fetch(outs[0])
    assert isinstance(fetched, tuple) and fetched[0].shape == (oh, ow)
    # the ingest must reproduce the RGBA the non-planar path would have fed
    f = _frame(20)
    planes = _rgba_to_yuv420(f)
    rgba_dev = np.asarray(color.make_yuv420_to_rgba(H, W)(*planes))
    rgba_host = _yuv420_to_rgba(*planes)
    assert np.abs(rgba_dev.astype(int) - rgba_host.astype(int)).max() <= 1
