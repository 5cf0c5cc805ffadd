"""Pallas kernels (interpret mode on the CPU mesh; compiled Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nu_scaler_tpu.kernels.resample_pallas import make_pallas_resampler
from nu_scaler_tpu.ops import resample
from nu_scaler_tpu.ops.metrics import psnr


@pytest.mark.parametrize("algo", ["lanczos3", "bilinear", "nearest"])
def test_pallas_resample_matches_xla(rng, algo):
    img = rng.integers(0, 256, (128, 256, 4), np.uint8)
    fn = make_pallas_resampler(128, 256, 256, 512, algo)
    if fn is None:
        pytest.skip("banded form does not tile")
    out = np.asarray(fn(img))
    ref = np.asarray(resample.make_resampler(128, 256, 256, 512, algo, "highest")(img))
    assert psnr(out, ref) >= 60.0


def test_pallas_fused_batched_matches_single(rng):
    """Batched fused resampler (one pallas_call, batch grid dim) must match
    the single-frame kernel per frame."""
    from nu_scaler_tpu.kernels.resample_pallas import (
        make_pallas_fused,
        make_pallas_fused_batched,
    )

    single = make_pallas_fused(128, 256, 256, 512, "lanczos3")
    batched = make_pallas_fused_batched(3, 128, 256, 256, 512, "lanczos3")
    assert single is not None and batched is not None
    frames = rng.integers(0, 256, (3, 128, 256, 4), np.uint8)
    out_b = np.asarray(batched(jnp.asarray(frames)))
    for i in range(3):
        out_s = np.asarray(single(jnp.asarray(frames[i])))
        np.testing.assert_array_equal(out_b[i], out_s)


def test_fsr_batched_pipeline_matches_single(rng):
    import jax
    import jax.numpy as jnp

    from nu_scaler_tpu.ops import fsr

    fn = fsr._fused_phase_pipeline(24, 32, 2, 0.2)
    assert fn is not None
    frames = rng.integers(0, 256, (2, 24, 32, 4), np.uint8)
    out_b = np.asarray(jax.jit(fn)(jnp.asarray(frames)))
    assert out_b.shape == (2, 48, 64, 4)
    for i in range(2):
        out_s = np.asarray(jax.jit(fn)(jnp.asarray(frames[i])))
        np.testing.assert_array_equal(out_b[i], out_s)


def test_pallas_conv3x3_matches_xla(rng):
    from nu_scaler_tpu.kernels.conv_pallas import make_conv3x3

    h, w, c = 32, 48, 128
    fn = make_conv3x3(h, w, c, c, relu=True)
    assert fn is not None
    x = jnp.asarray(rng.random((h, w, c), np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.random((3, 3, c, c), np.float32) - 0.5, jnp.bfloat16)
    b = jnp.asarray(rng.random((c,), np.float32) - 0.5, jnp.bfloat16)
    out = np.asarray(fn(x, k, b), np.float32)
    ref = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), k.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + b.astype(jnp.float32)
    ref = np.asarray(jnp.maximum(ref, 0.0), np.float32)
    # bf16 inputs both sides; tolerance for accumulation-order differences
    assert np.max(np.abs(out - ref)) < 0.35, np.max(np.abs(out - ref))
    assert np.mean(np.abs(out - ref)) < 0.02


def test_pallas_conv3x3_nonmultiple_height(rng):
    """h not divisible by the row-strip: internal pad + slice must keep SAME
    zero-pad semantics at the bottom edge."""
    from nu_scaler_tpu.kernels.conv_pallas import make_conv3x3

    h, w, c = 27, 40, 128  # 27 % 8 != 0
    fn = make_conv3x3(h, w, c, c, relu=False)
    assert fn is not None
    x = jnp.asarray(rng.random((h, w, c), np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.random((3, 3, c, c), np.float32) - 0.5, jnp.bfloat16)
    b = jnp.zeros((c,), jnp.bfloat16)
    out = np.asarray(fn(x, k, b), np.float32)
    assert out.shape == (h, w, c)
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            x[None].astype(jnp.float32), k.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0],
        np.float32,
    )
    assert np.max(np.abs(out - ref)) < 0.35


def test_trunk_fused_matches_xla_chain(rng):
    """Whole-trunk fused kernel (head → residual blocks → trunk+skip → tail
    in one pallas_call) vs the XLA conv chain of make_serving_fn_fused —
    including the frame borders, where the in-kernel masks must reproduce
    XLA's per-layer SAME zero padding."""
    from nu_scaler_tpu.kernels.conv_pallas import make_trunk_fused

    h, w, c, blocks = 40, 48, 128, 2
    x = jnp.asarray(rng.random((h, w, c), np.float32) - 0.5, jnp.bfloat16)

    def mk(ci, co):
        return (
            jnp.asarray(rng.random((3, 3, ci, co), np.float32) * 0.1 - 0.05),
            jnp.asarray(rng.random((co,), np.float32) * 0.02 - 0.01),
        )

    params = [*mk(c, c)]
    for _ in range(blocks):
        params += [*mk(c, c), *mk(c, c)]
    params += [*mk(c, c), *mk(c, 256)]

    def conv(y, k, b, relu=False):
        o = jax.lax.conv_general_dilated(
            y[None], k.astype(y.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0] + b.astype(y.dtype)
        return jnp.maximum(o, 0) if relu else o

    feat = conv(x, params[0], params[1])
    hh = feat
    for bi in range(blocks):
        k1, b1, k2, b2 = params[2 + 4 * bi : 6 + 4 * bi]
        t1 = conv(hh, k1, b1, relu=True)
        hh = hh + jnp.asarray(0.2, hh.dtype) * conv(t1, k2, b2)
    tk, tb, lk, lb = params[2 + 4 * blocks :]
    ref = np.asarray(conv(conv(hh, tk, tb) + feat, lk, lb), np.float32)

    fn = make_trunk_fused(h, w, c, c, 256, blocks, th=16)
    assert fn is not None
    out = np.asarray(fn(x, tuple(params)), np.float32)
    assert out.shape == ref.shape
    # bf16 both sides; accumulation-order noise only (borders included)
    assert np.max(np.abs(out - ref)) < 0.1, np.max(np.abs(out - ref))


def test_fused_blend_matches_resample_plus_blend(rng):
    """make_pallas_fused_blend: the upscale output must equal the fused
    resampler bit-exact, and the mid must equal blend_only(prev, upscale)."""
    from nu_scaler_tpu.kernels.resample_pallas import (
        make_pallas_fused,
        make_pallas_fused_blend,
    )
    from nu_scaler_tpu.ops.interpolate import blend_only

    in_h, in_w, out_h, out_w = 128, 256, 256, 512
    fb = make_pallas_fused_blend(in_h, in_w, out_h, out_w, "lanczos3", 0.5)
    if fb is None:
        pytest.skip("banded form does not tile")
    plain = make_pallas_fused(in_h, in_w, out_h, out_w, "lanczos3")
    cur = rng.integers(0, 256, (in_h, in_w, 4), np.uint8)
    prev_up = np.zeros(fb.out2d, np.uint8)
    prev_up_inner = rng.integers(0, 256, (out_h, out_w * 4), np.uint8)
    prev_up[:out_h, : out_w * 4] = prev_up_inner

    cur_up_2d, mid_2d = fb(jnp.asarray(cur), jnp.asarray(prev_up))
    cur_up = np.asarray(cur_up_2d)[:out_h, : out_w * 4].reshape(out_h, out_w, 4)
    mid = np.asarray(mid_2d)[:out_h, : out_w * 4].reshape(out_h, out_w, 4)

    ref_up = np.asarray(plain(jnp.asarray(cur)))
    np.testing.assert_array_equal(cur_up, ref_up)
    ref_mid = np.asarray(
        blend_only(prev_up_inner.reshape(out_h, out_w, 4), ref_up, 0.5)
    )
    # the kernel rounds the exact mix; blend_only's f32 ×(1/255)→×255
    # roundtrip can flip exact-half ties by 1 — allow ±1 on ties only
    diff = mid.astype(np.int32) - ref_mid.astype(np.int32)
    assert np.abs(diff).max() <= 1
    ties = (prev_up_inner.reshape(out_h, out_w, 4).astype(np.int32) + ref_up) % 2 == 1
    assert np.all((diff == 0) | ties)


def test_fused_blend_multi_t(rng):
    """time_t as a tuple: (1/3, 2/3) emits two mids + the upscale, each mid
    matching the single-t kernel at its own t."""
    from nu_scaler_tpu.kernels.resample_pallas import make_pallas_fused_blend

    in_h, in_w, out_h, out_w = 128, 256, 256, 512
    fb3 = make_pallas_fused_blend(in_h, in_w, out_h, out_w, "lanczos3", (1 / 3, 2 / 3))
    if fb3 is None:
        pytest.skip("banded form does not tile")
    cur = rng.integers(0, 256, (in_h, in_w, 4), np.uint8)
    prev_up = rng.integers(0, 256, fb3.out2d, np.uint8).astype(np.uint8)

    cur_up, m1, m2 = fb3(jnp.asarray(cur), jnp.asarray(prev_up))
    for t, m in ((1 / 3, m1), (2 / 3, m2)):
        single = make_pallas_fused_blend(in_h, in_w, out_h, out_w, "lanczos3", t)
        cu_s, m_s = single(jnp.asarray(cur), jnp.asarray(prev_up))
        np.testing.assert_array_equal(np.asarray(cur_up), np.asarray(cu_s))
        np.testing.assert_array_equal(np.asarray(m), np.asarray(m_s))
