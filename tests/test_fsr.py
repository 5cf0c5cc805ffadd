"""EASU + RCAS vs goldens (fsr.rs:24-260 semantics)."""

import numpy as np

from nu_scaler_tpu.kernels import reference as ref
from nu_scaler_tpu.ops import fsr
from nu_scaler_tpu.ops.metrics import psnr


def _rand_img(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)


def test_easu_golden(rng):
    img = _rand_img(rng, 24, 32)
    out = np.asarray(fsr.easu(img, 48, 64, 0.17))
    golden = ref.easu_ref(img, 48, 64, 0.17)
    assert out.shape == golden.shape == (48, 64, 4)
    assert psnr(out, golden) >= 50.0
    assert np.all(out[..., 3] == 255)


def test_rcas_golden(rng):
    img = _rand_img(rng, 32, 40)
    out = np.asarray(fsr.rcas(img, 0.2))
    golden = ref.rcas_ref(img, 0.2)
    assert psnr(out, golden) >= 50.0


def test_rcas_flat_image_unchanged():
    """Zero local contrast + zero Laplacian → output == input RGB."""
    img = np.full((16, 16, 4), 100, np.uint8)
    out = np.asarray(fsr.rcas(img, 0.25))
    np.testing.assert_array_equal(out[..., :3], img[..., :3])


def test_fsr_pipeline_shapes(rng):
    img = _rand_img(rng, 24, 32)
    fn = fsr.make_fsr_upscaler(24, 32, 48, 64, "ultra")
    out = np.asarray(fn(img))
    assert out.shape == (48, 64, 4)
    golden = ref.rcas_ref(
        ref.easu_ref(img, 48, 64, ref.FSR_SHARPNESS["ultra"]), ref.FSR_SHARPNESS["ultra"]
    )
    assert psnr(out, golden) >= 50.0


def test_rcas_sharpens_easu_edges(rng):
    """RCAS after EASU must narrow the edge transition EASU produces.

    (Note: the reference's simplified EASU WGSL projects tap distance along
    the gradient direction, which *widens* edges relative to bilinear — that
    behavior is golden-gated in test_easu_golden; the sharpening duty in the
    FSR1 pipeline belongs to RCAS.)"""
    img = np.zeros((32, 32, 4), np.uint8)
    img[:, 16:, :3] = 255
    img[..., 3] = 255

    def blur_width(x):
        mid = np.asarray(x)[32, :, 0].astype(np.int64)
        return int(np.sum((mid > 20) & (mid < 235)))

    easu_only = fsr.easu(img, 64, 64, 0.17)
    sharpened = fsr.rcas(easu_only, 0.25)
    assert blur_width(sharpened) <= blur_width(easu_only)


def test_fsr_pallas_matches_xla(rng):
    """The fused Pallas phase kernel must match the proven XLA polyphase
    path (same math, same border clamps) at 2x and 3x."""
    for scale, (h, w) in [(2, (40, 48)), (3, (24, 32))]:
        img = _rand_img(rng, h, w)
        fp = fsr.make_fsr_upscaler(h, w, h * scale, w * scale, "quality", impl="pallas")
        fx = fsr.make_fsr_upscaler(h, w, h * scale, w * scale, "quality", impl="xla")
        a, b = np.asarray(fp(img)), np.asarray(fx(img))
        assert a.shape == b.shape == (h * scale, w * scale, 4)
        assert psnr(a, b) >= 55.0, (scale, psnr(a, b))
