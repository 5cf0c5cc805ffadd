"""Interpolation pipeline vs numpy goldens + the analytic tests the reference
wrote but left `#[ignore]`d (wgpu_interpolator.rs:1386-1497)."""

import numpy as np
import pytest

from nu_scaler_tpu.kernels import reference as ref
from nu_scaler_tpu.ops import interpolate as interp
from nu_scaler_tpu.ops.metrics import psnr


def _rand_img(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)


def test_blend_zero_flow_parity(rng):
    """test_warp_blend_zero_flow (wgpu_interpolator.rs:1386): black + white at
    t=0.5 → mid gray; and vs golden on random frames."""
    a = np.zeros((16, 16, 4), np.uint8)
    b = np.full((16, 16, 4), 255, np.uint8)
    out = np.asarray(interp.interpolate_frames(a, b, 0.5, mode="blend"))
    assert np.all(out == 128)  # round(0.5*255) = 128

    fa, fb = _rand_img(rng, 33, 47), _rand_img(rng, 33, 47)
    out = np.asarray(interp.interpolate_frames(fa, fb, 0.25, mode="blend"))
    golden = ref.warp_blend_ref(fa, fb, np.zeros((33, 47, 2), np.float32), 0.25)
    assert psnr(out, golden) >= 50.0


def test_warp_blend_with_flow_matches_golden(rng):
    fa, fb = _rand_img(rng, 24, 40), _rand_img(rng, 24, 40)
    flow = (rng.random((24, 40, 2), dtype=np.float32) - 0.5) * 6.0
    import jax.numpy as jnp

    out = np.asarray(interp.warp_blend(jnp.asarray(fa), jnp.asarray(fb), jnp.asarray(flow), 0.5))
    golden = ref.warp_blend_ref(fa, fb, flow, 0.5)
    assert psnr(out, golden) >= 50.0


def test_gaussian_blur_golden(rng):
    img = rng.random((17, 23, 4)).astype(np.float32)
    out = np.asarray(interp.gaussian_blur(img))
    golden = ref.gaussian_blur_ref(img)
    np.testing.assert_allclose(out, golden, atol=1e-5)


def test_downsample_golden(rng):
    img = rng.random((17, 23, 4)).astype(np.float32)
    out = np.asarray(interp.downsample2x(img))
    golden = ref.downsample2x_ref(img)
    assert out.shape == (8, 11, 4)
    np.testing.assert_allclose(out, golden, atol=1e-6)


def test_pyramid_dims(rng):
    """test_build_pyramid dims assertions (wgpu_interpolator.rs:1461)."""
    img = rng.random((64, 48, 4)).astype(np.float32)
    pyr = interp.build_pyramid(img, 4)
    assert [p.shape[:2] for p in pyr] == [(64, 48), (32, 24), (16, 12), (8, 6)]


def test_hs_zero_flow_on_identical_frames(rng):
    """test_compute_coarse_flow_zeros (wgpu_interpolator.rs:1497): identical
    frames → zero flow stays zero."""
    import jax.numpy as jnp

    lum = jnp.asarray(rng.random((16, 16)).astype(np.float32))
    flow0 = jnp.zeros((16, 16, 2), jnp.float32)
    flow = np.asarray(interp.horn_schunck(lum, lum, flow0, 10))
    np.testing.assert_allclose(flow, 0.0, atol=1e-6)


def test_hs_step_golden(rng):
    import jax.numpy as jnp

    l1 = rng.random((12, 14)).astype(np.float32)
    l2 = rng.random((12, 14)).astype(np.float32)
    f0 = (rng.random((12, 14, 2)).astype(np.float32) - 0.5) * 2
    out = np.asarray(interp.horn_schunck(jnp.asarray(l1), jnp.asarray(l2), jnp.asarray(f0), 1))
    golden = ref.horn_schunck_step_ref(l1, l2, f0, interp.DEFAULT_LAMBDA)
    np.testing.assert_allclose(out, golden, atol=1e-4)


def test_flow_upsample_golden(rng):
    import jax.numpy as jnp

    flow = rng.random((8, 10, 2)).astype(np.float32)
    out = np.asarray(interp.flow_upsample(jnp.asarray(flow), 16, 20))
    golden = ref.flow_upsample_ref(flow, 16, 20)
    np.testing.assert_allclose(out, golden, atol=1e-5)


def test_flow_refine_step_golden(rng):
    import jax.numpy as jnp

    l1 = rng.random((12, 14)).astype(np.float32)
    l2 = rng.random((12, 14)).astype(np.float32)
    f0 = (rng.random((12, 14, 2)).astype(np.float32) - 0.5) * 2
    out = np.asarray(
        interp.flow_refine(jnp.asarray(l1), jnp.asarray(l2), jnp.asarray(f0), 1, subpixel=False)
    )
    golden = ref.flow_refine_step_ref(l1, l2, f0, interp.DEFAULT_ALPHA)
    np.testing.assert_allclose(out, golden, atol=1e-4)


def test_uniform_shift_flow_recovery():
    """test_refine_flow_uniform_shift — the analytic test the reference
    skeleton'd (wgpu_interpolator.rs:1497+): a smooth pattern shifted by
    (+2, 0) pixels should produce flow with positive mean x-component."""
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (
        127.5
        + 80 * np.sin(xx * (2 * np.pi / 24))
        + 40 * np.sin(yy * (2 * np.pi / 32))
    )
    shift = 2
    a = np.zeros((h, w, 4), np.uint8)
    b = np.zeros((h, w, 4), np.uint8)
    for c in range(3):
        a[..., c] = np.clip(base, 0, 255).astype(np.uint8)
        b[..., c] = np.clip(np.roll(base, shift, axis=1), 0, 255).astype(np.uint8)
    a[..., 3] = b[..., 3] = 255

    flow = np.asarray(interp.compute_flow(a, b, levels=3, coarse_iters=64, refine_iters=8))
    inner = flow[8:-8, 8:-8]
    mean_u = inner[..., 0].mean()
    # HS flow under-estimates large shifts; direction + significance is the gate
    assert mean_u > 0.5, f"mean flow x {mean_u:.3f}, expected positive toward {shift}"
    assert abs(inner[..., 1].mean()) < 0.5


def test_block_warp_uniform_integer_shift(rng):
    """block_warp with a uniform integer offset must be an exact shift
    (away from edges)."""
    import jax.numpy as jnp
    from nu_scaler_tpu.ops.interpolate import block_warp

    img = rng.random((32, 256, 3)).astype(np.float32)
    off = np.tile(np.array([3.0, 2.0], np.float32), (32, 256, 1))  # (x=3, y=2)
    out = np.asarray(block_warp(jnp.asarray(img), jnp.asarray(off)))
    np.testing.assert_allclose(out[:-2, :-3], img[2:, 3:], atol=1e-5)


def test_block_warp_subpixel(rng):
    """Half-pixel uniform offset = average of neighbors."""
    import jax.numpy as jnp
    from nu_scaler_tpu.ops.interpolate import block_warp

    img = rng.random((16, 128, 1)).astype(np.float32)
    off = np.tile(np.array([0.5, 0.0], np.float32), (16, 128, 1))
    out = np.asarray(block_warp(jnp.asarray(img), jnp.asarray(off)))
    expected = 0.5 * (img[:, :-1] + img[:, 1:])
    np.testing.assert_allclose(out[:, :-1], expected, atol=1e-5)


def test_fast_flow_uniform_shift():
    h, w = 48, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127.5 + 80 * np.sin(xx * (2 * np.pi / 24)) + 40 * np.sin(yy * (2 * np.pi / 32))
    fa = np.zeros((h, w, 4), np.uint8)
    fb = np.zeros((h, w, 4), np.uint8)
    for c in range(3):
        fa[..., c] = np.clip(base, 0, 255)
        fb[..., c] = np.clip(np.roll(base, 2, axis=1), 0, 255)
    fa[..., 3] = fb[..., 3] = 255
    fl = np.asarray(interp.compute_flow_fast(fa, fb, levels=3))
    assert fl[8:-8, 8:-8, 0].mean() > 1.0
    assert abs(fl[8:-8, 8:-8, 1].mean()) < 0.5


def test_flow_mode_beats_blend_on_motion():
    """End-to-end value test: on a moving scene the flow-compensated
    interpolation must beat plain cross-fade vs the true middle frame."""
    h, w = 48, 80
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def scene(offset):
        """A bright Gaussian blob sliding right over a dark background —
        smooth, non-periodic, ideal for gradient-based flow."""
        img = np.zeros((h, w, 4), np.uint8)
        blob = 230.0 * np.exp(
            -(((xx - 30.0 - offset) / 10.0) ** 2 + ((yy - 24.0) / 10.0) ** 2)
        )
        for c in range(3):
            img[..., c] = np.clip(20.0 + blob, 0, 255).astype(np.uint8)
        img[..., 3] = 255
        return img

    a, mid_true, b = scene(0), scene(3), scene(6)
    out_blend = np.asarray(interp.interpolate_frames(a, b, 0.5, mode="blend"))
    out_flow = np.asarray(interp.interpolate_frames(a, b, 0.5, mode="flow"))
    out_exact = np.asarray(interp.interpolate_frames(a, b, 0.5, mode="flow_exact"))
    p_blend = psnr(out_blend, mid_true)
    p_flow = psnr(out_flow, mid_true)
    p_exact = psnr(out_exact, mid_true)
    assert p_flow > p_blend, f"flow {p_flow:.1f} dB should beat blend {p_blend:.1f} dB"
    assert p_exact > p_blend, f"exact {p_exact:.1f} dB should beat blend {p_blend:.1f} dB"


def test_soft_interp_multi_matches_single_and_orders_times():
    """N-factor frame generation: soft_interp_multi shares one motion solve
    across times — t=0.5 must equal the single-t production path bit-exact,
    and a sliding scene's mids must track their times monotonically."""
    h, w = 64, 256  # tile-divisible → the fused Pallas path
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def scene(offset):
        img = np.zeros((h, w, 4), np.uint8)
        blob = 230.0 * np.exp(
            -(((xx - 80.0 - offset) / 16.0) ** 2 + ((yy - 32.0) / 12.0) ** 2)
        )
        for c in range(3):
            img[..., c] = np.clip(20.0 + blob, 0, 255).astype(np.uint8)
        img[..., 3] = 255
        return img

    a, b = scene(0), scene(9)
    multi = np.asarray(interp.soft_interp_multi(a, b, (1 / 3, 0.5, 2 / 3)))
    assert multi.shape == (3, h, w, 4)
    single = np.asarray(interp.soft_interp_fast(a, b, 0.5))
    np.testing.assert_array_equal(multi[1], single)
    # each mid should look most like the true frame at its own time
    for i, off in enumerate((3.0, 4.5, 6.0)):
        truth = scene(off)
        own = psnr(multi[i], truth)
        other = max(
            psnr(multi[j], truth) for j in range(3) if j != i
        )
        assert own >= other, f"t[{i}] mid matches a different time ({own:.1f} vs {other:.1f} dB)"


def test_interpolate_multi_py_api():
    """Public WgpuFrameInterpolator.interpolate_multi_py: byte contract,
    time validation, and agreement with interpolate_py at the same t."""
    import nu_scaler_core as n

    it = n.WgpuFrameInterpolator(mode="flow_soft")
    h, w = 32, 256
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (h, w, 4), np.uint8)
    a[..., 3] = 255
    b = np.roll(a, 5, axis=1)
    outs = it.interpolate_multi_py(
        a.tobytes(), b.tobytes(), w, h, times=(0.25, 0.5, 0.75)
    )
    assert len(outs) == 3 and all(len(o) == h * w * 4 for o in outs)
    single = it.interpolate_py(a.tobytes(), b.tobytes(), w, h, time_t=0.5)
    assert outs[1] == single
    with pytest.raises(ValueError):
        it.interpolate_multi_py(a.tobytes(), b.tobytes(), w, h, times=())
    with pytest.raises(ValueError):
        it.interpolate_multi_py(a.tobytes(), b.tobytes(), w, h, times=(1.5,))
    with pytest.raises(ValueError):
        it.interpolate_multi_py(a.tobytes()[:-4], b.tobytes(), w, h)


def test_flow_base_level_knob_clamps_and_tracks_motion():
    """flow_base_level: the latency/quality knob on the fused soft path.
    Explicit levels must keep tile-divisibility (an impossible level clamps
    down to what the warp tile divides), and a coarser flow must still
    motion-compensate better than a plain cross-fade."""
    h, w = 64, 256
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    def scene(offset):
        img = np.zeros((h, w, 4), np.uint8)
        blob = 230.0 * np.exp(
            -(((xx - 80.0 - offset) / 16.0) ** 2 + ((yy - 32.0) / 12.0) ** 2)
        )
        for c in range(3):
            img[..., c] = np.clip(20.0 + blob, 0, 255).astype(np.uint8)
        img[..., 3] = 255
        return img

    import jax.numpy as jnp

    a, b, truth = scene(0), scene(10), scene(5)
    blend = psnr(np.asarray(interp.blend_only(jnp.asarray(a), jnp.asarray(b), 0.5)), truth)
    for bl in (2, 3):
        mid = np.asarray(interp.soft_interp_fast(a, b, 0.5, flow_base_level=bl))
        assert psnr(mid, truth) > blend + 3.0, f"bl={bl} barely beats blend"
    # level 9 is impossible for the (8, 128) warp tile → clamps (no crash),
    # and clamps to the SAME level 3 ⇒ identical output
    hi = np.asarray(interp.soft_interp_fast(a, b, 0.5, flow_base_level=9))
    lo = np.asarray(interp.soft_interp_fast(a, b, 0.5, flow_base_level=3))
    np.testing.assert_array_equal(hi, lo)
