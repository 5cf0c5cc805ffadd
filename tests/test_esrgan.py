"""ESRGAN-lite: shapes, training-loss decrease, dp×tp sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nu_scaler_tpu.models import esrgan_lite as el


def test_forward_shapes():
    model, params = el.init_params(stages=1, features=16, blocks=2)
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    y = model.apply(params, x)
    assert y.shape == (2, 32, 32, 3)


def test_pretrained_upscaler_contract(rng):
    fn = el.make_pretrained_upscaler(16, 16, 32, 32)
    img = rng.integers(0, 256, (16, 16, 4), np.uint8)
    out = np.asarray(fn(jnp.asarray(img)))
    assert out.shape == (32, 32, 4)
    assert out.dtype == np.uint8


def test_training_reduces_loss(rng):
    """A few steps on a fixed synthetic batch must reduce L1 loss."""
    model, params = el.init_params(stages=1, features=16, blocks=2)
    opt = optax.adam(1e-3)
    step = el.make_train_step(model, opt)
    opt_state = opt.init(params)

    hr = rng.random((4, 32, 32, 3), dtype=np.float32)
    lr = hr[:, ::2, ::2, :]
    hr_j, lr_j = jnp.asarray(hr), jnp.asarray(lr)
    params, opt_state, loss0 = step(params, opt_state, lr_j, hr_j)
    loss_last = loss0
    for _ in range(10):
        params, opt_state, loss_last = step(params, opt_state, lr_j, hr_j)
    assert float(loss_last) < float(loss0), f"{loss_last} !< {loss0}"


def test_distill_step_pulls_toward_teacher(rng):
    """The two-term distillation step reduces the combined loss, and w=1
    (teacher-only) drives the student toward the teacher output, not HR."""
    from nu_scaler_tpu.models.train import make_distill_step

    model, params = el.init_params(stages=1, features=16, blocks=2)
    hr = rng.random((4, 32, 32, 3), dtype=np.float32)
    lr = hr[:, ::2, ::2, :]
    teach = np.clip(hr + 0.25, 0.0, 1.0)  # distinct fixed "teacher" target
    lr_j, hr_j, t_j = jnp.asarray(lr), jnp.asarray(hr), jnp.asarray(teach)

    opt = optax.adam(1e-2)
    step = make_distill_step(model, opt, "l1", w=1.0)
    opt_state = opt.init(params)
    params2, opt_state, loss0 = step(params, opt_state, lr_j, hr_j, t_j)
    for _ in range(30):
        params2, opt_state, loss_last = step(params2, opt_state, lr_j, hr_j, t_j)
    assert float(loss_last) < float(loss0)
    pred = model.apply(params2, lr_j)
    d_teach = float(jnp.mean(jnp.abs(pred - t_j)))
    d_hr = float(jnp.mean(jnp.abs(pred - hr_j)))
    assert d_teach < d_hr, f"teacher-only distill should track teacher ({d_teach} !< {d_hr})"


def test_sharded_train_step_runs():
    """dp×tp (4×2) training step executes and matches unsharded loss."""
    from nu_scaler_tpu.parallel.mesh import make_2d_mesh

    mesh = make_2d_mesh(4, 2)
    model, params = el.init_params(stages=1, features=16, blocks=2)
    opt = optax.adam(1e-3)
    step, sparams, opt_state = el.make_sharded_train_step(model, opt, mesh, params)

    rng = np.random.default_rng(7)
    hr = jnp.asarray(rng.random((8, 32, 32, 3), dtype=np.float32))
    lr = hr[:, ::2, ::2, :]
    sparams2, opt_state, loss = step(sparams, opt_state, lr, hr)
    assert np.isfinite(float(loss))

    # parity with the unsharded step
    ref_loss = float(el.l1_loss(model, params, lr, hr))
    assert abs(float(loss) - ref_loss) < 1e-4


def test_trained_checkpoint_beats_bilinear():
    """The committed checkpoint must outperform bilinear on held-out
    synthetic scenes — the learned tier is only worth shipping if it wins."""
    from nu_scaler_tpu.models.train import load_checkpoint, make_batch

    restored = load_checkpoint(1)
    if restored is None:
        pytest.skip("no committed checkpoint")
    params, _ = restored
    model = el.ESRGANLite(stages=1)
    rng = np.random.default_rng(99)
    lr_b, hr_b = make_batch(rng, 8)
    pred = np.asarray(model.apply(params, jnp.asarray(lr_b)))
    base = np.asarray(jax.image.resize(jnp.asarray(lr_b), hr_b.shape, "bilinear"))
    mse_model = float(((pred - hr_b) ** 2).mean())
    mse_bilinear = float(((base - hr_b) ** 2).mean())
    assert mse_model < mse_bilinear


def test_scale_to_stages():
    assert el.scale_to_stages(540, 1080) == 1
    assert el.scale_to_stages(540, 2160) == 2
    assert el.scale_to_stages(1080, 2160) == 1


def test_phase_base_matches_bilinear_resize():
    """With the tail zeroed, the phase-domain fixed base conv must reproduce
    jax.image.resize bilinear (half-pixel centers) exactly in the interior
    (borders differ: conv zero-pad vs resize edge clamp)."""
    import jax

    for stride in (2, 4):
        m = el.ESRGANLiteTPU(upscale=2, stride=stride, features=8, blocks=1)
        rng = np.random.default_rng(stride)
        x = jnp.asarray(rng.random((1, 32, 48, 3), np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        params = jax.tree_util.tree_map(lambda p: p, params)  # copy
        import flax

        pd = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
        pd["params"]["tail"]["kernel"] = jnp.zeros_like(pd["params"]["tail"]["kernel"])
        pd["params"]["tail"]["bias"] = jnp.zeros_like(pd["params"]["tail"]["bias"])
        out = np.asarray(m.apply(pd, x))[0]
        ref = np.asarray(jax.image.resize(x, (1, 64, 96, 3), "bilinear"))[0]
        mrg = 2 * stride
        diff = np.abs(out[mrg:-mrg, mrg:-mrg] - ref[mrg:-mrg, mrg:-mrg]).max()
        assert diff < 1e-5, (stride, diff)


def test_x4_checkpoint_serves_scale4():
    """A trained x4 (stages=2) checkpoint must serve 4× learned upscaling
    through the standard exact phase-domain path."""
    import os
    import pytest

    from nu_scaler_tpu.models.train import ckpt_dir

    if not os.path.exists(os.path.join(ckpt_dir(2, "tpu4"), "latest.txt")):
        pytest.skip("no tpu4 x4 checkpoint")
    fn = el.make_pretrained_upscaler(32, 64, 128, 256)
    assert fn.arch == "tpu4", fn.arch
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (32, 64, 4), np.uint8))
    out = np.asarray(fn(img))
    assert out.shape == (128, 256, 4) and out.dtype == np.uint8


def test_performance_ladder_prefers_fast_archs():
    """make_fast_upscaler must serve the performance ladder's head (tpu4b1
    since r3 — it dominates the stride-8 trunks on both axes; stride-8 stays
    as fallback); make_pretrained_upscaler must stay on the quality-first
    ladder."""
    import os
    import pytest

    from nu_scaler_tpu.models.train import ckpt_dir

    if not os.path.exists(os.path.join(ckpt_dir(1, "tpu8"), "latest.txt")):
        pytest.skip("no tpu8 checkpoint")
    fast = el.make_fast_upscaler(32, 64, 64, 128)
    assert fast.arch in ("tpu4b1", "tpu8", "tpu8w"), fast.arch
    qual = el.make_pretrained_upscaler(32, 64, 64, 128)
    assert qual.arch in ("tpu4b2", "tpu4", "tpu", "lite"), qual.arch
    # both must honor the u8 RGBA contract
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (32, 64, 4), np.uint8))
    out = np.asarray(fast(img))
    assert out.shape == (64, 128, 4) and out.dtype == np.uint8


def test_facade_dlss_performance_uses_fast_ladder():
    import os
    import pytest

    import nu_scaler_core as nsc
    from nu_scaler_tpu.models.train import ckpt_dir

    if not os.path.exists(os.path.join(ckpt_dir(1, "tpu8"), "latest.txt")):
        pytest.skip("no tpu8 checkpoint")
    up = nsc.NuScaler.with_technology("dlss", "performance").upscaler
    assert getattr(up, "learned_prefer", "quality") == "performance"
    up.initialize(64, 32, 128, 64)
    assert getattr(up._fn, "arch", None) in ("tpu4b1", "tpu8", "tpu8w")
    # dlss×ultra = the held-out quality peak (r4: the distilled tpu4b2
    # beats tpu4 on full bf16 eval and leads the ultra ladder)
    up_u = nsc.NuScaler.with_technology("dlss", "ultra").upscaler
    assert getattr(up_u, "learned_prefer", None) == "ultra"
    up_u.initialize(64, 32, 128, 64)
    if os.path.exists(os.path.join(ckpt_dir(1, "tpu4b2"), "latest.txt")):
        assert getattr(up_u._fn, "arch", None) == "tpu4b2"
        assert not up_u._fn.quantized  # ultra never quantizes
    # plain dlss (quality) = the >=240 fps quality-first ladder
    up_q = nsc.NuScaler.with_technology("dlss", "quality").upscaler
    up_q.initialize(64, 32, 128, 64)
    assert getattr(up_q._fn, "arch", None) in ("tpu4b2", "tpu4", "tpu", "lite")


def test_sparse_base_matches_dense():
    """base_impl="sparse" (center-cell 1×1 + neighbor corrections) must be
    numerically identical to the dense fixed base conv — serving relies on
    checkpoint interchangeability between the two."""
    import jax

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 32, 48, 3), np.float32))
    for stride, feats in ((2, 16), (4, 16), (8, 16)):
        m1 = el.ESRGANLiteTPU(
            upscale=2, stride=stride, features=feats, blocks=1, base_impl="conv"
        )
        m2 = el.ESRGANLiteTPU(
            upscale=2, stride=stride, features=feats, blocks=1, base_impl="sparse"
        )
        p = m1.init(jax.random.PRNGKey(0), x)
        o1 = np.asarray(m1.apply(p, x))
        o2 = np.asarray(m2.apply(p, x))
        np.testing.assert_allclose(o1, o2, rtol=1e-5, atol=1e-5)


def test_tpu_phase_domain_consistent():
    """phase_domain=True output, depth-to-spaced, equals __call__'s image."""
    import jax

    m = el.ESRGANLiteTPU(upscale=2, stride=4, features=16, blocks=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    full = np.asarray(m.apply(params, x))
    ph = np.asarray(m.apply(params, x, phase_domain=True))
    r = 8
    d2s = ph.reshape(1, 8, 8, r, r, 3).transpose(0, 1, 3, 2, 4, 5).reshape(1, 64, 64, 3)
    np.testing.assert_allclose(full, d2s, rtol=1e-6, atol=1e-6)


def test_learned_tier_beats_lanczos3_held_out():
    """VERDICT r1 #3 done-criterion: the shipped tpu4 checkpoint must beat
    the lanczos3 classical tier on held-out clips (PSNR)."""
    import jax
    import pytest

    from nu_scaler_tpu.models import train as T
    from nu_scaler_tpu.models.data import eval_vs_lanczos3

    restored = T.load_checkpoint(1, "tpu4")
    if restored is None:
        pytest.skip("no tpu4 checkpoint committed")
    model = el.ESRGANLiteTPU(upscale=2, stride=4, features=128)
    params = restored[0]
    fn = jax.jit(lambda x: model.apply(params, x))
    q = eval_vs_lanczos3(fn, scale=2, seeds=(900,))
    assert q["psnr_delta_db"] > 0.0, q


def test_fused_serving_matches_apply_path(rng):
    """The fused raw-domain serving graph (select-matmul s2d, expanded
    RGBA-interleaved tail+base — make_serving_fn_fused) must reproduce the
    straightforward model.apply serving path bit-near (round-3 serving
    surgery; only bf16 association order and the alpha resample differ)."""
    import jax.numpy as jnp

    for stride, base_impl in ((4, "conv"), (8, "sparse"), (2, "conv")):
        h, w = 32, 64
        model = el.ESRGANLiteTPU(
            upscale=2, stride=stride, features=32, blocks=2, base_impl=base_impl
        )
        params = model.init(
            jax.random.PRNGKey(3), jnp.zeros((1, h, w, 3), jnp.float32)
        )
        img = rng.integers(0, 256, (h, w, 4), np.uint8)
        img[..., 3] = 255
        fused = el.make_serving_fn_fused(model, params, h, w)
        out_f = np.asarray(fused(jnp.asarray(img)))
        plain = el.make_serving_fn.__wrapped__ if hasattr(el.make_serving_fn, "__wrapped__") else el.make_serving_fn
        # build the OLD exact path directly (bypass the fused dispatch)
        p_cast = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
        f01 = img[..., :3].astype(np.float32)[None] / 255.0
        ref_rgb = model.apply(p_cast, jnp.asarray(f01, jnp.bfloat16))
        ref_rgb = np.asarray(
            jnp.clip(jnp.round(ref_rgb[0].astype(jnp.float32) * 255.0), 0, 255)
        ).astype(np.uint8)
        d = out_f[..., :3].astype(np.float64) - ref_rgb.astype(np.float64)
        assert out_f.shape == (2 * h, 2 * w, 4)
        # raw-domain bf16 (ulp 1 at 255) vs [0,1]-domain bf16 (ulp ~0.004):
        # a few LSB of association noise — gate like every kernel golden
        psnr = 10 * np.log10(255.0**2 / max(float(np.mean(d**2)), 1e-12))
        assert psnr >= 45.0, (stride, psnr, np.abs(d).max())
        assert np.abs(d).mean() < 1.0, (stride, np.abs(d).mean())
        np.testing.assert_array_equal(out_f[..., 3], 255)  # alpha preserved


def test_fused_serving_is_dispatched_for_exact_ratios(rng):
    """make_serving_fn must route exact-ratio conv models through the fused
    graph (the 1080p->4K production path)."""
    import jax.numpy as jnp

    model = el.ESRGANLiteTPU(upscale=2, stride=4, features=16, blocks=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3), jnp.float32))
    seen = []
    orig = el.make_serving_fn_fused

    def spy(*a, **k):
        seen.append(1)
        return orig(*a, **k)

    el.make_serving_fn_fused, saved = spy, el.make_serving_fn_fused
    try:
        fn = el.make_serving_fn(model, params, 16, 32, 32, 64)
        img = rng.integers(0, 256, (16, 32, 4), np.uint8)
        out = np.asarray(fn(jnp.asarray(img)))
        assert out.shape == (32, 64, 4) and seen
    finally:
        el.make_serving_fn_fused = saved


def test_int8_quant_apply_tracks_f32(rng):
    """The int8 trunk (make_quant_apply — per-O-channel weight grid +
    calibrated activation scales) must track the f32 forward closely on
    in-calibration-range inputs: the global bilinear skip carries the
    signal, so quantization noise only rides the learned residual."""
    import jax
    import jax.numpy as jnp

    model = el.ESRGANLiteTPU(upscale=2, stride=4, features=32, blocks=2)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3), jnp.float32))
    lr = rng.random((2, 32, 32, 3)).astype(np.float32)
    scales = el.calibrate_trunk_scales(model, params, lr)
    assert set(scales) == {
        "block0/conv1", "block0/conv2", "block1/conv1", "block1/conv2",
        "trunk", "tail",
    }
    assert all(v > 0 for v in scales.values())
    ref = np.asarray(model.apply(params, jnp.asarray(lr)))
    out = np.asarray(el.make_quant_apply(model, params, scales)(jnp.asarray(lr)))
    assert out.shape == ref.shape
    # random-init residuals are large relative to the skip — still ≤5% err
    assert float(np.max(np.abs(out - ref))) < 0.05


def test_int8_fused_serving_matches_quant_apply(rng):
    """The int8 fused serving graph and its float-domain eval twin share one
    integer grid: u8 outputs must agree to a couple of LSB (bf16 vs f32
    elementwise domains are the only difference)."""
    import jax
    import jax.numpy as jnp

    h, w = 32, 64
    model = el.ESRGANLiteTPU(upscale=2, stride=4, features=32, blocks=2)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, h, w, 3), jnp.float32))
    img = rng.integers(0, 256, (h, w, 4), np.uint8)
    img[..., 3] = 255
    lr = img[None, ..., :3].astype(np.float32) / 255.0
    scales = el.calibrate_trunk_scales(model, params, lr)

    served = np.asarray(
        el.make_serving_fn_fused(model, params, h, w, quant_scales=scales)(
            jnp.asarray(img)
        )
    )
    twin = np.asarray(el.make_quant_apply(model, params, scales)(jnp.asarray(lr)))[0]
    twin_u8 = np.clip(np.round(twin * 255.0), 0, 255).astype(np.uint8)
    d = served[..., :3].astype(int) - twin_u8.astype(int)
    assert served.shape == (2 * h, 2 * w, 4)
    # random-init residuals + bf16(raw) vs f32([0,1]) domains: ~1 LSB mean
    assert float(np.abs(d).mean()) < 1.5, np.abs(d).mean()
    psnr = 10 * np.log10(255.0**2 / max(float(np.mean(d.astype(float) ** 2)), 1e-12))
    assert psnr >= 42.0, psnr
    np.testing.assert_array_equal(served[..., 3], 255)


def test_quality_ladder_serves_int8_when_calibrated(monkeypatch):
    """With a matching act_scales.json the quality ladder head is the
    quant-gated tpu4b2-int8 entry (283 fps ≥ the 240 gate at +5.67 dB
    held-out 3-seed, r4 distill+down_mix); without calibration the bf16
    fallback order applies and the "quant"-mode entries are skipped.
    "ultra" never quantizes (fidelity peak)."""
    import os
    import pytest

    from nu_scaler_tpu.models import train as T

    if T.load_act_scales(1, "tpu4b2") is None:
        pytest.skip("no tpu4b2 int8 calibration")

    q = el._build_pretrained(32, 64, 64, 128, jnp.bfloat16, 1, "quality")
    assert q.arch == "tpu4b2" and q.quantized

    u = el._build_pretrained(32, 64, 64, 128, jnp.bfloat16, 1, "ultra")
    assert not u.quantized

    # calibration absent → the quant-gated tpu4 head must be skipped
    monkeypatch.setattr(T, "load_act_scales", lambda *a, **k: None)
    import nu_scaler_tpu.models.esrgan_lite as el_mod
    q2 = el_mod._build_pretrained(32, 64, 64, 128, jnp.bfloat16, 1, "quality")
    assert q2.arch != "tpu4" or not q2.quantized
    assert not q2.quantized

    # contract: quantized serving still emits u8 RGBA at the right shape
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, (32, 64, 4), np.uint8))
    out = np.asarray(q(img))
    assert out.shape == (64, 128, 4) and out.dtype == np.uint8


def test_int8_io_quant_preserves_alpha_and_flat_fields(rng):
    """Optional head/base int8 ("head"/"base" scale entries): the DC-exact
    base dequant must reproduce flat fields — and the α≡255 plane that rides
    the base — EXACTLY. (Measured perf negative on v5e: the underfilled
    64-channel head/base contractions gain nothing from int8 — 3.886 vs
    3.871 ms on tpu4, int8_io_probe.py — so production act_scales.json files
    carry no head/base entries; the path stays a tested knob.)"""
    import jax

    h, w = 32, 64
    model = el.ESRGANLiteTPU(upscale=2, stride=4, features=32, blocks=2)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, h, w, 3), jnp.float32))
    img = rng.integers(0, 256, (h, w, 4), np.uint8)
    img[..., 3] = 255
    lr = img[None, ..., :3].astype(np.float32) / 255.0
    scales = el.calibrate_trunk_scales(model, params, lr)
    sio = dict(scales, head=1.0, base=1.0)

    served = np.asarray(
        el.make_serving_fn_fused(model, params, h, w, quant_scales=sio)(
            jnp.asarray(img)
        )
    )
    np.testing.assert_array_equal(served[..., 3], 255)

    # the twin shares the grid: u8 agreement within a couple of LSB
    twin = np.asarray(el.make_quant_apply(model, params, sio)(jnp.asarray(lr)))[0]
    twin_u8 = np.clip(np.round(twin * 255.0), 0, 255).astype(np.uint8)
    d = served[..., :3].astype(int) - twin_u8.astype(int)
    assert float(np.abs(d).mean()) < 1.5, np.abs(d).mean()

    # DC-exact base: a flat frame stays flat through the quantized graph's
    # fixed path (the learned tail adds its own response — compare against
    # the UNQUANTIZED serving output instead of a constant)
    flat = np.full((h, w, 4), 200, np.uint8)
    flat[..., 3] = 255
    ref = np.asarray(el.make_serving_fn_fused(model, params, h, w)(jnp.asarray(flat)))
    out = np.asarray(
        el.make_serving_fn_fused(model, params, h, w, quant_scales=sio)(
            jnp.asarray(flat)
        )
    )
    assert float(np.abs(out.astype(int) - ref.astype(int)).mean()) < 1.5


def test_pair_pool_down_mix_sources():
    """down_mix renders that fraction of the clip pool supersampled (2× then
    area-down) — the source-diversity lever for fine-tune legs. Both modes
    must yield the same crop geometry and [0,1] range, and the downsampled
    sources must actually differ from the native render of the same seed."""
    import numpy as np

    from nu_scaler_tpu.models.data import PairPool

    kw = dict(scale=2, crop=64, n_clips=2, frames_per_clip=2, pool_size=16)
    native = PairPool(np.random.default_rng(0), down_mix=0.0, **kw)
    mixed = PairPool(np.random.default_rng(0), down_mix=0.5, **kw)
    assert mixed.hrs.shape == native.hrs.shape == (16, 64, 64, 3)
    assert mixed.lrs.shape == (16, 32, 32, 3)
    assert 0.0 <= mixed.hrs.min() and mixed.hrs.max() <= 1.0
    # same rng draw + same crop coordinates, but clip 0's frames come from a
    # different (supersampled) source — the pools must not be identical
    assert not np.allclose(mixed.hrs, native.hrs)


def test_batch_upscaler_matches_single(rng):
    """make_pretrained_batch_upscaler (vmapped fused serving graph) must
    reproduce the single-frame production path per frame: same weights,
    same int8 grid — the batch only amortizes dispatch overhead
    (tools/experiments/esrgan_surgery7.py arm D). u8 tolerance 1 LSB for
    batched-conv reduction-order ties."""
    single = el.make_pretrained_upscaler(16, 16, 32, 32)
    batched = el.make_pretrained_batch_upscaler(16, 16, 32, 32)
    assert batched.arch == single.arch
    assert batched.quantized == single.quantized
    imgs = rng.integers(0, 256, (3, 16, 16, 4), np.uint8)
    out_b = np.asarray(batched(jnp.asarray(imgs)))
    assert out_b.shape == (3, 32, 32, 4) and out_b.dtype == np.uint8
    for i in range(3):
        out_s = np.asarray(single(jnp.asarray(imgs[i])))
        diff = np.abs(out_b[i].astype(np.int32) - out_s.astype(np.int32))
        assert diff.max() <= 1
