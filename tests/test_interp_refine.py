"""Learned MC-interpolation refinement (models/interp_refine.py): model
contract, fused-serving ≍ float-twin parity, training step, and the
flow_soft_ref mode dispatch/fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nu_scaler_tpu.models import interp_refine as ir


def _tiny_model():
    return ir.make_model(features=16, blocks=1)


def test_forward_shape():
    model, params = _tiny_model()
    x = jnp.zeros((2, 32, 64, 9), jnp.float32)
    assert model.apply(params, x).shape == (2, 32, 64, 3)


def test_training_step_reduces_loss(rng):
    """A few steps on a fixed batch must reduce the residual L1."""
    model, params = _tiny_model()
    a = rng.random((4, 32, 32, 3), dtype=np.float32)
    b = np.roll(a, 2, axis=2)
    tgt = 0.5 * (a + b) + 0.05
    mid = 0.5 * (a + b)
    xb = jnp.asarray(np.concatenate([a, b, mid], axis=-1))
    yb = jnp.asarray(tgt)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def lf(p):
            pred = xb[..., 6:9] + model.apply(p, xb)
            return jnp.mean(jnp.abs(pred - yb))

        lv, g = jax.value_and_grad(lf)(params)
        up, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state, lv

    params, opt_state, l0 = step(params, opt_state)
    for _ in range(60):
        params, opt_state, ll = step(params, opt_state)
    assert float(ll) < float(l0)


def test_fused_serving_matches_float_twin(rng, monkeypatch):
    """The raw-domain serving graph (selector s2d, ×255 tail fold) and the
    float apply share weights: u8 outputs agree within a couple of LSB, and
    alpha passes through from the mid untouched."""
    model, params = _tiny_model()
    monkeypatch.setattr(ir, "load_checkpoint", lambda: (params, 0))
    monkeypatch.setattr(ir, "make_model", lambda features=128, blocks=1: (model, params))
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    ir._make_refine_fn.cache_clear()

    a = rng.integers(0, 256, (32, 64, 4), np.uint8)
    a[..., 3] = 255
    b = np.roll(a, 3, axis=1)
    mid = ((a.astype(int) + b.astype(int)) // 2).astype(np.uint8)
    out = np.asarray(ir.refine_mid(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mid)))

    af, bf, mf = (t[None, ..., :3].astype(np.float32) / 255.0 for t in (a, b, mid))
    tw = np.asarray(ir.make_apply(params)(jnp.asarray(af), jnp.asarray(bf), jnp.asarray(mf)))[0]
    tw8 = np.clip(np.round(tw * 255.0), 0, 255).astype(np.uint8)
    d = out[..., :3].astype(int) - tw8.astype(int)
    assert float(np.abs(d).mean()) < 1.0
    np.testing.assert_array_equal(out[..., 3], 255)

    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    ir._make_refine_fn.cache_clear()


def test_quant_serving_matches_quant_twin(rng, monkeypatch, tmp_path):
    """With act_scales.json present the serving graph runs the int8 trunk;
    it must agree with the float-domain quant twin (same integer grid) to a
    couple of LSB, keep alpha exact, and ignore a stale-step scales file."""
    model, params = _tiny_model()
    monkeypatch.setattr(ir, "load_checkpoint", lambda: (params, 7))
    monkeypatch.setattr(ir, "make_model", lambda features=128, blocks=1: (model, params))
    monkeypatch.setattr(ir, "CKPT_DIR", str(tmp_path))

    a = rng.integers(0, 256, (32, 64, 4), np.uint8)
    a[..., 3] = 255
    b = np.roll(a, 3, axis=1)
    mid = ((a.astype(int) + b.astype(int)) // 2).astype(np.uint8)
    af, bf, mf = (t[None, ..., :3].astype(np.float32) / 255.0 for t in (a, b, mid))

    xs = np.concatenate([af, bf, mf], axis=-1)
    scales = ir.calibrate_scales(params, crops=xs)
    assert set(scales) == {"head", "block0/conv1", "block0/conv2", "tail"}
    ir.save_act_scales(scales, step=7)

    # stale-step gating
    assert ir.load_act_scales(step=8) is None
    assert ir.load_act_scales(step=7) == scales

    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    ir._make_refine_fn.cache_clear()
    out = np.asarray(ir.refine_mid(*(jnp.asarray(t) for t in (a, b, mid))))
    np.testing.assert_array_equal(out[..., 3], 255)

    tw = np.asarray(ir.make_quant_apply(params, scales)(
        jnp.asarray(af), jnp.asarray(bf), jnp.asarray(mf)))[0]
    tw8 = np.clip(np.round(tw * 255.0), 0, 255).astype(np.uint8)
    d = out[..., :3].astype(int) - tw8.astype(int)
    assert float(np.abs(d).mean()) < 1.0

    # and the quant twin must sit near the float twin (int8 is a refinement
    # of the same weights, not a different net)
    fl = np.asarray(ir.make_apply(params)(
        jnp.asarray(af), jnp.asarray(bf), jnp.asarray(mf)))[0]
    assert float(np.abs(tw - fl).mean()) < 0.02

    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    ir._make_refine_fn.cache_clear()


def test_flow_soft_ref_mode_falls_back_without_checkpoint(rng, monkeypatch):
    """mode="flow_soft_ref" without a trained checkpoint must equal plain
    flow_soft (graceful degradation, like every other optional tier)."""
    from nu_scaler_tpu.ops import interpolate as I

    monkeypatch.setattr(ir, "load_checkpoint", lambda: None)
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    I.make_interpolator.cache_clear()

    a = jnp.asarray(rng.integers(0, 256, (16, 256, 4), np.uint8))
    b = jnp.asarray(np.roll(np.asarray(a), 4, axis=1))
    ref = np.asarray(I.make_interpolator(16, 256, "flow_soft")(a, b, 0.5))
    out = np.asarray(I.make_interpolator(16, 256, "flow_soft_ref")(a, b, 0.5))
    np.testing.assert_array_equal(out, ref)
    I.make_interpolator.cache_clear()
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()


def test_flow_soft_ref_mode_applies_refinement(rng, monkeypatch):
    """With a checkpoint present the mode must route through the net (a
    random-init net produces a different frame than plain flow_soft)."""
    from nu_scaler_tpu.ops import interpolate as I

    model, params = _tiny_model()
    monkeypatch.setattr(ir, "load_checkpoint", lambda: (params, 0))
    monkeypatch.setattr(ir, "make_model", lambda features=128, blocks=1: (model, params))
    monkeypatch.setattr(I, "REFINE_MIN_ROWS", 0)  # tiny CPU-mesh frames
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    I.make_interpolator.cache_clear()

    a = jnp.asarray(rng.integers(0, 256, (16, 256, 4), np.uint8))
    b = jnp.asarray(np.roll(np.asarray(a), 4, axis=1))
    ref = np.asarray(I.make_interpolator(16, 256, "flow_soft")(a, b, 0.5))
    out = np.asarray(I.make_interpolator(16, 256, "flow_soft_ref")(a, b, 0.5))
    assert out.shape == ref.shape
    assert not np.array_equal(out[..., :3], ref[..., :3])
    np.testing.assert_array_equal(out[..., 3], ref[..., 3])  # alpha untouched

    I.make_interpolator.cache_clear()
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()


def test_flow_soft_ref_serving_band_guard(rng, monkeypatch):
    """refine_serves() is the serving policy: with REFINE_MIN_ROWS raised
    (the knob for a checkpoint whose gain regresses below a validity band —
    the native-only 40k lost at 144p; the adopted 64k gains everywhere so
    the production floor is 0) the mode must serve plain flow_soft below
    the floor even WITH a checkpoint, and the dp mesh path must refuse."""
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.parallel import mesh as pmesh

    model, params = _tiny_model()
    monkeypatch.setattr(ir, "load_checkpoint", lambda: (params, 0))
    monkeypatch.setattr(ir, "make_model", lambda features=128, blocks=1: (model, params))
    monkeypatch.setattr(I, "REFINE_MIN_ROWS", 64)
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    I.make_interpolator.cache_clear()

    assert not I.refine_serves(16, 256)  # below the floor
    assert I.refine_serves(64, 256)
    assert not I.refine_serves(66, 256)  # must tile by 4

    a = jnp.asarray(rng.integers(0, 256, (16, 256, 4), np.uint8))
    b = jnp.asarray(np.roll(np.asarray(a), 4, axis=1))
    ref = np.asarray(I.make_interpolator(16, 256, "flow_soft")(a, b, 0.5))
    out = np.asarray(I.make_interpolator(16, 256, "flow_soft_ref")(a, b, 0.5))
    np.testing.assert_array_equal(out, ref)

    # explicit dp request below the floor is an explicit error
    import pytest as _pytest

    m = pmesh.make_mesh()
    n = m.devices.size
    pa = rng.integers(0, 256, (n, 16, 256, 4), np.uint8)
    with _pytest.raises(ValueError, match="serving band"):
        pmesh.interpolate_batch_sharded(pa, pa, 0.5, "flow_soft_ref", m)

    I.make_interpolator.cache_clear()
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()


def test_api_interpolator_accepts_mode(rng, monkeypatch):
    """The PyO3-parity interpolator accepts the new mode string end-to-end."""
    import nu_scaler_core as nsc

    monkeypatch.setattr(ir, "load_checkpoint", lambda: None)
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    it = nsc.create_interpolator("flow_soft_ref")
    a = rng.integers(0, 256, (16, 256, 4), np.uint8).tobytes()
    b = rng.integers(0, 256, (16, 256, 4), np.uint8).tobytes()
    out = it.interpolate_py(a, b, 256, 16, time_t=0.5)
    assert len(out) == 16 * 256 * 4
    # unknown kinds fall back to "blend" (reference-style silent default)
    assert nsc.create_interpolator("nonsense").mode == "blend"


def test_eval_interp_refinement_helper(rng, monkeypatch):
    """The held-out eval helper (bench.py's quality line) scores both modes
    on the same clips; without a checkpoint the delta is exactly zero."""
    from nu_scaler_tpu.models.data import eval_interp_refinement
    from nu_scaler_tpu.ops import interpolate as I

    monkeypatch.setattr(ir, "load_checkpoint", lambda: None)
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    I.make_interpolator.cache_clear()

    q = eval_interp_refinement(seeds=(900,), frames=3, height=64, width=128)
    assert q["psnr_delta_db"] == 0.0 and q["ssim_delta"] == 0.0
    assert q["soft_psnr_db"] > 10.0

    I.make_interpolator.cache_clear()
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()


def test_stage_timings_flow_soft_ref(rng, monkeypatch):
    """stage_timings_ms("flow_soft_ref") must time the PRODUCTION stages
    (tile-flow + soft warp, like flow_soft — the r2 bug class was timing the
    exact path for a soft mode) and report the refinement's share."""
    from nu_scaler_tpu.ops import interpolate as I

    model, params = _tiny_model()
    monkeypatch.setattr(ir, "load_checkpoint", lambda: (params, 0))
    monkeypatch.setattr(ir, "make_model", lambda features=128, blocks=1: (model, params))
    monkeypatch.setattr(I, "REFINE_MIN_ROWS", 0)  # tiny CPU-mesh frames
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    I.make_interpolator.cache_clear()
    I.calibrated_step_ms.cache_clear()

    d = I.stage_timings_ms(16, 256, "flow_soft_ref", iters=2)
    assert set(d) == {"total_ms", "flow_ms", "warp_ms", "refine_ms"}
    assert all(v >= 0.0 for v in d.values())

    I.make_interpolator.cache_clear()
    I.calibrated_step_ms.cache_clear()
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()


def test_refined_mid_upscaler_phase_path(rng, monkeypatch):
    """make_refined_mid_upscaler (soft warp → phase net → phase-domain
    banded resample, ONE program, no d2s relayout) must match the composed
    reference path up(refine(mid)) to a couple of LSB (same weights,
    different summation order — refine_bisect5 measured max|Δ|=3 at 4K)."""
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample

    model, params = _tiny_model()
    monkeypatch.setattr(ir, "load_checkpoint", lambda: (params, 0))
    monkeypatch.setattr(ir, "make_model", lambda features=128, blocks=1: (model, params))
    monkeypatch.setattr(I, "REFINE_MIN_ROWS", 0)  # tiny CPU-mesh frames
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    I.make_refined_mid_upscaler.cache_clear()

    h, w, oh, ow = 136, 256, 272, 512
    a = jnp.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))
    b = jnp.asarray(np.roll(np.asarray(a), 4, axis=1))

    fused = I.make_refined_mid_upscaler(h, w, oh, ow)
    got = np.asarray(fused(a, b, 0.5))

    mid = I.soft_interp_fast(a, b, 0.5)
    refined = ir.get_refine_graph(h, w)(a, b, mid)
    want = np.asarray(resample.make_resampler(h, w, oh, ow, "lanczos3")(refined))

    assert got.shape == (oh, ow, 4)
    from nu_scaler_tpu.ops.metrics import psnr

    assert psnr(got, want) >= 55.0

    I.make_refined_mid_upscaler.cache_clear()
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()


def test_refined_mid_upscaler_falls_back_without_checkpoint(rng, monkeypatch):
    """Without a checkpoint the fused upscaler degrades to up(flow_soft)."""
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample

    monkeypatch.setattr(ir, "load_checkpoint", lambda: None)
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    I.make_refined_mid_upscaler.cache_clear()

    h, w, oh, ow = 136, 256, 272, 512
    a = jnp.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))
    b = jnp.asarray(np.roll(np.asarray(a), 4, axis=1))
    got = np.asarray(I.make_refined_mid_upscaler(h, w, oh, ow)(a, b, 0.5))
    mid = I.soft_interp_fast(a, b, 0.5)
    want = np.asarray(resample.make_resampler(h, w, oh, ow, "lanczos3")(mid))
    np.testing.assert_array_equal(got, want)

    I.make_refined_mid_upscaler.cache_clear()
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()


def test_refined_multi_upscaler_matches_per_mid_composition(rng, monkeypatch):
    """make_refined_multi_upscaler (one motion solve, each mid refined +
    phase-resampled) must match the per-mid composed path to PSNR ≥ 55."""
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops import resample

    model, params = _tiny_model()
    monkeypatch.setattr(ir, "load_checkpoint", lambda: (params, 0))
    monkeypatch.setattr(ir, "make_model", lambda features=128, blocks=1: (model, params))
    monkeypatch.setattr(I, "REFINE_MIN_ROWS", 0)  # tiny CPU-mesh frames
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()
    I.make_refined_multi_upscaler.cache_clear()

    h, w, oh, ow = 136, 256, 272, 512
    ts = (1.0 / 3.0, 2.0 / 3.0)
    a = jnp.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))
    b = jnp.asarray(np.roll(np.asarray(a), 4, axis=1))

    outs = np.asarray(I.make_refined_multi_upscaler(h, w, oh, ow, ts)(a, b))
    assert outs.shape == (2, oh, ow, 4)

    mids = I.soft_interp_multi(a, b, ts)
    ref = ir.get_refine_graph(h, w)
    up = resample.make_resampler(h, w, oh, ow, "lanczos3")
    from nu_scaler_tpu.ops.metrics import psnr

    for i in range(2):
        want = np.asarray(up(ref(a, b, mids[i])))
        assert psnr(outs[i], want) >= 55.0

    I.make_refined_multi_upscaler.cache_clear()
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()


def test_triplet_pool_factor_and_source_diversity(rng):
    """The training pool accepts t-factor (2, 3) and source (native,
    down4k) diversity: correct crop shapes, [0,1] range, targets distinct
    from mids (there is something to learn)."""
    pool = ir.TripletPool(
        rng, crop=32, n_clips=2, frames_per_clip=4, pool_size=12,
        height=96, width=160, factors=(2, 3), sources=("native", "down4k"),
    )
    assert pool.xs.shape == (12, 32, 32, 9)
    assert pool.ys.shape == (12, 32, 32, 3)
    assert 0.0 <= pool.xs.min() and pool.xs.max() <= 1.0
    assert 0.0 <= pool.ys.min() and pool.ys.max() <= 1.0
    mids = pool.xs[..., 6:9]
    assert float(np.abs(mids - pool.ys).mean()) > 1e-4


def test_named_checkpoints_and_distill_leg(tmp_path, monkeypatch):
    """Teacher/student plumbing (VERDICT r4 #8 groundwork): non-default
    checkpoint names save/load beside the serving net without touching it,
    and a distill leg loads the frozen teacher and trains. Runs in a temp
    CKPT_ROOT so the real checkpoints stay untouched."""
    import os

    monkeypatch.setattr(ir, "_ckpt_dir",
                        lambda name="interp_ref4": str(tmp_path / name))

    class _StubPool:
        # the real TripletPool's rendering is covered by
        # test_triplet_pool_factor_and_source_diversity; this test is about
        # checkpoint naming + distill wiring, so keep it off the clock
        def __init__(self, rng, **kw):
            crop = kw.get("crop", 16)
            n = kw.get("pool_size", 8)
            self.xs = rng.random((n, crop, crop, 9), dtype=np.float32)
            self.ys = rng.random((n, crop, crop, 3), dtype=np.float32)

    monkeypatch.setattr(ir, "TripletPool", _StubPool)
    ir.train(steps=2, batch=2, n_clips=1, pool_size=8, height=96, width=160,
             crop=16, log_every=1, features=16, blocks=2, name="t_teacher")
    assert os.path.exists(tmp_path / "t_teacher" / "latest.txt")
    # student leg distilling from the frozen teacher
    ir.train(steps=2, batch=2, n_clips=1, pool_size=8, height=96, width=160,
             crop=16, log_every=1, features=8, blocks=1, name="t_student",
             distill=("t_teacher", 16, 2), distill_w=0.5)
    params, step = ir.load_checkpoint("t_student")
    assert step == 2
    # the serving-net loader never sees the named nets (default dir empty)
    assert ir.load_checkpoint() is None
