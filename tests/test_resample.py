"""Resample kernels vs numpy goldens (PSNR gate from BASELINE.json: >= 50 dB;
nearest must be exact)."""

import jax
import numpy as np
import pytest

from nu_scaler_tpu.kernels import reference as ref
from nu_scaler_tpu.ops import resample
from nu_scaler_tpu.ops.metrics import ErrorMetrics, psnr

SIZES = [((24, 32), (48, 64)), ((37, 53), (91, 119)), ((64, 48), (96, 120))]


def _rand_img(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)


def test_nearest_exact(rng):
    for (ih, iw), (oh, ow) in SIZES:
        img = _rand_img(rng, ih, iw)
        out = np.asarray(resample.upscale_frame(img, oh, ow, "nearest"))
        golden = ref.nearest_ref(img, oh, ow)
        np.testing.assert_array_equal(out, golden)


def test_bilinear_psnr(rng):
    for (ih, iw), (oh, ow) in SIZES:
        img = _rand_img(rng, ih, iw)
        out = np.asarray(resample.upscale_frame(img, oh, ow, "bilinear"))
        golden = ref.bilinear_ref(img, oh, ow)
        p = psnr(out, golden)
        assert p >= 50.0, f"bilinear {ih}x{iw}->{oh}x{ow}: PSNR {p:.1f}"


@pytest.mark.parametrize("algo", ["bicubic", "lanczos2", "lanczos3", "mitchell", "area"])
def test_matrix_algos_psnr(rng, algo):
    for (ih, iw), (oh, ow) in SIZES[:2]:
        img = _rand_img(rng, ih, iw)
        out = np.asarray(resample.upscale_frame(img, oh, ow, algo))
        golden = ref.separable_resample_ref(img, oh, ow, algo)
        p = psnr(out, golden)
        assert p >= 50.0, f"{algo} {ih}x{iw}->{oh}x{ow}: PSNR {p:.1f}"


def test_downscale_area(rng):
    img = _rand_img(rng, 64, 64)
    out = np.asarray(resample.upscale_frame(img, 32, 32, "area"))
    golden = ref.separable_resample_ref(img, 32, 32, "area")
    assert psnr(out, golden) >= 50.0
    # area downsample of a constant image is constant
    const = np.full((64, 64, 4), 200, np.uint8)
    out2 = np.asarray(resample.upscale_frame(const, 16, 16, "area"))
    assert np.all(out2 >= 199) and np.all(out2 <= 200)


def test_identity_scale(rng):
    """Same-size resample should be near-identity for interpolating kernels."""
    img = _rand_img(rng, 40, 40)
    for algo in ["nearest", "bilinear", "area"]:
        out = np.asarray(resample.upscale_frame(img, 40, 40, algo))
        np.testing.assert_array_equal(out, img)
    # lanczos/bicubic at identity: centers land exactly on samples
    for algo in ["bicubic", "lanczos2", "lanczos3"]:
        out = np.asarray(resample.upscale_frame(img, 40, 40, algo))
        assert psnr(out, img) >= 50.0


def test_batch_matches_single(rng):
    imgs = np.stack([_rand_img(rng, 24, 32) for _ in range(3)])
    fn = resample.make_resampler(24, 32, 48, 64, "lanczos3")
    batched = np.asarray(fn(imgs))
    for i in range(3):
        single = np.asarray(fn(imgs[i]))
        # batched and unbatched compile to different contraction orders; a
        # trunc-boundary pixel may flip by 1
        np.testing.assert_allclose(
            batched[i].astype(int), single.astype(int), atol=1
        )
    fn_nn = resample.make_resampler(24, 32, 48, 64, "nearest")
    np.testing.assert_array_equal(
        np.asarray(fn_nn(imgs))[1], np.asarray(fn_nn(imgs[1]))
    )


def test_normalize_algorithm():
    assert resample.normalize_algorithm("Nearest Neighbor") == "nearest"
    assert resample.normalize_algorithm("BILINEAR") == "bilinear"
    assert resample.normalize_algorithm("Balanced") == "bicubic"
    assert resample.normalize_algorithm("unknown-thing") == "nearest"  # silent fallback
    assert resample.normalize_algorithm("Lanczos3") == "lanczos3"


def test_quality_algorithm_map():
    assert resample.quality_algorithm("ultra") == "lanczos3"
    assert resample.quality_algorithm("quality") == "lanczos2"
    assert resample.quality_algorithm("balanced") == "bicubic"
    assert resample.quality_algorithm("performance") == "bilinear"


def test_error_metrics_parity():
    a = np.zeros((8, 8, 4), np.uint8)
    b = np.zeros((8, 8, 4), np.uint8)
    m = ErrorMetrics.calculate(a, b)
    assert m.mse == 0.0 and m.psnr == float("inf")
    b[..., 0] = 10  # alpha-only diffs must NOT count (RGB-only, common.rs:503-506)
    m2 = ErrorMetrics.calculate(a, b)
    assert abs(m2.mse - 100.0 / 3.0) < 1e-9
    a2 = a.copy()
    a2[..., 3] = 77
    assert ErrorMetrics.calculate(a2, a).mse == 0.0


def test_awkward_scale_dense_fallback_gather_free(rng):
    """VERDICT r2 #7: non-tiling (awkward) scales must NOT fall back to
    jnp.take gather bodies (8-20 ms/frame on this TPU backend). Every
    algorithm routes through the dense weight-matrix MXU path and still
    passes its golden gate (nearest bit-exact)."""
    img = rng.integers(0, 256, (37, 53, 4), np.uint8)
    for algo in resample.ALGORITHMS:
        fn = resample.make_resampler(37, 53, 91, 131, algo)
        out = np.asarray(fn(img))
        assert out.shape == (91, 131, 4)
        if algo == "nearest":
            np.testing.assert_array_equal(out, ref.nearest_ref(img, 91, 131))
        elif algo == "bilinear":
            assert psnr(out, ref.bilinear_ref(img, 91, 131)) >= 50.0
        else:
            assert psnr(out, ref.separable_resample_ref(img, 91, 131, algo)) >= 50.0
    # the jitted HLO must contain no gather op at all
    lowered = jax.jit(
        resample.make_resampler.__wrapped__(37, 53, 91, 131, "bilinear")
    ).lower(img).as_text()
    assert "gather" not in lowered, "awkward-scale resample still lowers a gather"


def test_phase_resampler_matches_d2s_then_resampler(rng):
    """make_phase_resampler consumes an s2d phase tensor and must equal
    make_resampler(d2s(ph)) — the d2s permutation folded into the banded
    passes only relabels the tap axis (refine_bisect5: 2.98 vs 5.67 ms at
    1080p→4K; bit-exact on the CPU mesh)."""
    st = 4
    # large enough that the banded form exists (tc=128 output-row tiles)
    ih, iw, oh, ow = 136, 256, 272, 512
    nh, nw = ih // st, iw // st
    img = rng.integers(0, 256, (ih, iw, 4), np.uint8)
    # s2d phase decomposition: ph[n, m, q·st·4 + p·4 + c] = img[st·n+q, st·m+p, c]
    ph = (
        img.reshape(nh, st, nw, st, 4)
        .transpose(0, 2, 1, 3, 4)
        .reshape(nh, nw, st * st * 4)
        .astype(np.float32)
    )
    for algo in ("lanczos3", "bicubic", "bilinear"):
        pfn = resample.make_phase_resampler(ih, iw, oh, ow, st, algo)
        assert pfn is not None, f"phase resampler must exist for {algo} 2x"
        got = np.asarray(pfn(ph))
        want = np.asarray(resample.make_resampler(ih, iw, oh, ow, algo)(img))
        assert got.shape == want.shape == (oh, ow, 4)
        assert psnr(got, want) >= 55.0, f"{algo}: phase path diverges"


def test_phase_resampler_unavailable_on_awkward_scale():
    """Non-tiling scales have no st-aligned banded form → None (callers
    fall back to d2s + make_resampler)."""
    assert resample.make_phase_resampler(64, 128, 91, 131, 4) is None
