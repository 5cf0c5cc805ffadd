"""Multi-device sharding on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from nu_scaler_tpu.parallel import mesh as pmesh
from nu_scaler_tpu.ops import resample
from nu_scaler_tpu.ops.metrics import psnr


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


def test_batch_sharded_matches_single(rng):
    m = pmesh.make_mesh()
    frames = rng.integers(0, 256, (8, 24, 32, 4), np.uint8)
    out = np.asarray(pmesh.upscale_batch_sharded(frames, 48, 64, "lanczos3", m))
    single_fn = resample.make_resampler(24, 32, 48, 64, "lanczos3")
    for i in range(8):
        # different compiled programs may flip trunc-boundary pixels by 1
        np.testing.assert_allclose(
            out[i].astype(int), np.asarray(single_fn(frames[i])).astype(int), atol=1
        )


def test_batch_sharded_pads_ragged(rng):
    m = pmesh.make_mesh()
    frames = rng.integers(0, 256, (5, 16, 16, 4), np.uint8)  # 5 not divisible by 8
    out = np.asarray(pmesh.upscale_batch_sharded(frames, 32, 32, "bilinear", m))
    assert out.shape == (5, 32, 32, 4)


def test_interpolate_batch_sharded_matches_single(rng):
    """dp MC-interpolation: each chip's shard must equal the single-device
    pipeline (same program, batch axis sharded)."""
    from nu_scaler_tpu.ops import interpolate as I

    m = pmesh.make_mesh()
    pa = rng.integers(0, 256, (8, 32, 64, 4), np.uint8)
    pb = np.roll(pa, 3, axis=2)
    for mode in ("blend", "flow_soft"):
        out = np.asarray(
            pmesh.interpolate_batch_sharded(pa, pb, 0.5, mode, m, levels=2)
        )
        assert out.shape == (8, 32, 64, 4)
        if mode == "blend":
            ref = np.asarray(I.blend_only(jax.numpy.asarray(pa[0]), jax.numpy.asarray(pb[0]), 0.5))
        else:
            flow = I.compute_flow_fast(
                jax.numpy.asarray(pa[0]), jax.numpy.asarray(pb[0]), levels=2
            )
            ref = np.asarray(
                I.warp_blend_fast(
                    jax.numpy.asarray(pa[0]), jax.numpy.asarray(pb[0]), flow, 0.5,
                    overlap=True,
                )
            )
        np.testing.assert_allclose(out[0].astype(int), ref.astype(int), atol=2)


def test_fsr_batch_sharded_matches_single(rng):
    from nu_scaler_tpu.ops import fsr as F

    m = pmesh.make_mesh()
    frames = rng.integers(0, 256, (8, 16, 24, 4), np.uint8)
    out = np.asarray(pmesh.fsr_batch_sharded(frames, 32, 48, "quality", m))
    assert out.shape == (8, 32, 48, 4)
    single = F.make_fsr_upscaler(16, 24, 32, 48, "quality")
    np.testing.assert_allclose(
        out[3].astype(int), np.asarray(single(frames[3])).astype(int), atol=1
    )


def test_interpolate_batch_sharded_pads_ragged(rng):
    """Ragged batches pad to a mesh multiple and slice back — the same
    contract as upscale_batch_sharded (ADVICE r2)."""
    m = pmesh.make_mesh()
    pa = rng.integers(0, 256, (5, 16, 32, 4), np.uint8)
    out = np.asarray(pmesh.interpolate_batch_sharded(pa, pa, 0.5, "blend", m))
    assert out.shape == (5, 16, 32, 4)
    np.testing.assert_array_equal(out, pa)  # blend(a, a, t) == a


def test_fsr_batch_sharded_pads_ragged(rng):
    m = pmesh.make_mesh()
    frames = rng.integers(0, 256, (3, 16, 24, 4), np.uint8)
    out = np.asarray(pmesh.fsr_batch_sharded(frames, 32, 48, "quality", m))
    assert out.shape == (3, 32, 48, 4)


def test_interpolate_frame_spatial_matches_single(rng):
    """sp MC-interpolation (VERDICT r2 #9): ONE pair's rows sharded over the
    mesh; XLA inserts the stencil/warp halo collectives. Must match the
    single-device program."""
    from nu_scaler_tpu.ops import interpolate as I
    import jax.numpy as jnp

    m = pmesh.make_mesh()
    a = rng.integers(0, 256, (64, 64, 4), np.uint8)
    b = np.roll(a, 3, axis=1)
    for mode in ("blend", "flow", "flow_soft"):
        out = np.asarray(pmesh.interpolate_frame_spatial(a, b, 0.5, mode, m, levels=2))
        assert out.shape == (64, 64, 4)
        if mode == "blend":
            ref = np.asarray(I.blend_only(jnp.asarray(a), jnp.asarray(b), 0.5))
        else:
            flow = I.compute_flow_fast(jnp.asarray(a), jnp.asarray(b), levels=2)
            ref = np.asarray(
                I.warp_blend_fast(
                    jnp.asarray(a), jnp.asarray(b), flow, 0.5,
                    overlap=mode == "flow_soft",
                )
            )
        np.testing.assert_allclose(out.astype(int), ref.astype(int), atol=2)


def test_interpolate_frame_spatial_refined_matches_single(rng):
    """sp flow_soft_ref: soft warp + the learned refinement net in ONE
    sharded program (float-domain module forward — the selector-matmul
    serving graph would force an all-gather under row sharding). Must match
    the same math run single-device."""
    from nu_scaler_tpu.models import interp_refine as ir
    from nu_scaler_tpu.ops import interpolate as I
    import jax.numpy as jnp

    if not ir.refine_available():
        pytest.skip("no interp_ref4 checkpoint")
    m = pmesh.make_mesh()
    a = rng.integers(0, 256, (64, 64, 4), np.uint8)
    b = np.roll(a, 3, axis=1)
    out = np.asarray(
        pmesh.interpolate_frame_spatial(a, b, 0.5, "flow_soft_ref", m, levels=2)
    )
    assert out.shape == (64, 64, 4)

    # single-device reference: same float-domain formula
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    flow = I.compute_flow_fast(aj, bj, levels=2)
    mid = I.warp_blend_fast(aj, bj, flow, 0.5, overlap=True)
    params, _ = ir.load_checkpoint()
    model, _ = ir.make_model()
    triple = jnp.concatenate(
        [aj[..., :3], bj[..., :3], mid[..., :3]], axis=-1
    ).astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)
    res = model.apply(params, triple[None])[0]
    rgb = np.clip(
        np.round(
            np.asarray(mid[..., :3], np.float32)
            + np.asarray(res, np.float32) * 255.0
        ),
        0,
        255,
    ).astype(np.uint8)
    ref = np.concatenate([rgb, np.asarray(mid[..., 3:])], axis=-1)
    # bf16 sums under sharding can land on the other side of round()'s
    # knife edge for a handful of pixels — same ±2 u8 gate as the sp warp
    np.testing.assert_allclose(out.astype(int), ref.astype(int), atol=2)
    # and the refinement must actually change the mid (net is non-trivial)
    assert np.any(out[..., :3] != np.asarray(mid[..., :3]))


@pytest.mark.parametrize("mode", ["flow", "flow_soft"])
def test_interpolate_frame_spatial_production_depth(rng, mode):
    """sp interpolation at the PRODUCTION pyramid depth (levels=4, VERDICT
    r3 weak #7): 8 shards of 8 rows each put the coarsest pyramid level at
    ONE row per shard, so every blur/downsample/Horn–Schunck stencil halo
    crosses shard boundaries — the regime levels=2 never exercised."""
    from nu_scaler_tpu.ops import interpolate as I
    import jax.numpy as jnp

    m = pmesh.make_mesh()
    a = rng.integers(0, 256, (64, 64, 4), np.uint8)
    b = np.roll(a, 3, axis=1)
    out = np.asarray(pmesh.interpolate_frame_spatial(a, b, 0.5, mode, m, levels=4))
    assert out.shape == (64, 64, 4)
    flow = I.compute_flow_fast(jnp.asarray(a), jnp.asarray(b), levels=4)
    ref = np.asarray(
        I.warp_blend_fast(
            jnp.asarray(a), jnp.asarray(b), flow, 0.5, overlap=mode == "flow_soft"
        )
    )
    np.testing.assert_allclose(out.astype(int), ref.astype(int), atol=2)


def test_interpolate_frame_spatial_refined_production_depth(rng):
    """sp flow_soft_ref at levels=4: the refinement net's conv halos AND the
    deep pyramid's stencil halos cross 8-row shard boundaries in one sharded
    program."""
    from nu_scaler_tpu.models import interp_refine as ir
    from nu_scaler_tpu.ops import interpolate as I
    import jax.numpy as jnp

    if not ir.refine_available():
        pytest.skip("no interp_ref4 checkpoint")
    m = pmesh.make_mesh()
    a = rng.integers(0, 256, (64, 64, 4), np.uint8)
    b = np.roll(a, 3, axis=1)
    out = np.asarray(
        pmesh.interpolate_frame_spatial(a, b, 0.5, "flow_soft_ref", m, levels=4)
    )
    assert out.shape == (64, 64, 4)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    flow = I.compute_flow_fast(aj, bj, levels=4)
    mid = I.warp_blend_fast(aj, bj, flow, 0.5, overlap=True)
    params, _ = ir.load_checkpoint()
    model, _ = ir.make_model()
    triple = jnp.concatenate(
        [aj[..., :3], bj[..., :3], mid[..., :3]], axis=-1
    ).astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)
    res = model.apply(params, triple[None])[0]
    rgb = np.clip(
        np.round(
            np.asarray(mid[..., :3], np.float32)
            + np.asarray(res, np.float32) * 255.0
        ),
        0,
        255,
    ).astype(np.uint8)
    ref = np.concatenate([rgb, np.asarray(mid[..., 3:])], axis=-1)
    np.testing.assert_allclose(out.astype(int), ref.astype(int), atol=2)


def test_interpolate_multi_spatial_production_depth(rng):
    """sp N-factor frame generation at levels=4 (one motion solve, halos
    across 8-row shards at every pyramid level)."""
    from nu_scaler_tpu.ops import interpolate as I
    import jax.numpy as jnp

    m = pmesh.make_mesh()
    a = rng.integers(0, 256, (64, 64, 4), np.uint8)
    b = np.roll(a, 3, axis=1)
    ts = (1.0 / 3.0, 2.0 / 3.0)
    out = np.asarray(pmesh.interpolate_multi_spatial(a, b, ts, "flow_soft", m, levels=4))
    assert out.shape == (2, 64, 64, 4)
    flow = I.compute_flow_fast(jnp.asarray(a), jnp.asarray(b), levels=4)
    for i, t in enumerate(ts):
        ref = np.asarray(
            I.warp_blend_fast(jnp.asarray(a), jnp.asarray(b), flow, t, overlap=True)
        )
        np.testing.assert_allclose(out[i].astype(int), ref.astype(int), atol=2)


@pytest.mark.parametrize("algo", ["bilinear", "lanczos3"])
def test_spatial_sharded_matches_single(rng, algo):
    m = pmesh.make_mesh()
    frame = rng.integers(0, 256, (24, 32, 4), np.uint8)
    out = np.asarray(pmesh.upscale_frame_spatial(frame, 48, 64, algo, m))
    single = np.asarray(resample.upscale_frame(frame, 48, 64, algo))
    assert psnr(out, single) >= 50.0
    np.testing.assert_allclose(out.astype(int), single.astype(int), atol=1)


def test_spatial_rejects_indivisible(rng):
    m = pmesh.make_mesh()
    frame = rng.integers(0, 256, (24, 32, 4), np.uint8)
    with pytest.raises(ValueError, match="not divisible"):
        pmesh.shard_spatial_resampler(m, 24, 32, 50, 64, "lanczos3")


def test_esrgan_infer_spatial_matches_single_device():
    """sp inference: frame rows sharded over the mesh; XLA inserts the conv
    halo exchanges. Output must match unsharded inference."""
    import jax
    import jax.numpy as jnp

    from nu_scaler_tpu.models import esrgan_lite as el
    from nu_scaler_tpu.parallel import mesh as pmesh

    m = el.ESRGANLiteTPU(upscale=2, stride=2, features=8, blocks=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 64, 32, 3), dtype=np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    mesh = pmesh.make_mesh(8)
    out_sp = np.asarray(pmesh.esrgan_infer_spatial(m, p, x, mesh))
    out_ref = np.asarray(m.apply(p, x))
    np.testing.assert_allclose(out_sp, out_ref, rtol=2e-5, atol=2e-5)


def test_fsr_frame_spatial_matches_single(rng):
    """sp FSR: ONE frame's rows sharded over the mesh through the XLA
    polyphase EASU+RCAS chain (halo exchanges from the sharding
    annotations). Must match the single-device XLA program exactly."""
    from nu_scaler_tpu.ops import fsr as F

    m = pmesh.make_mesh()
    frame = rng.integers(0, 256, (16, 24, 4), np.uint8)
    out = np.asarray(pmesh.fsr_frame_spatial(frame, 32, 48, "quality", m))
    assert out.shape == (32, 48, 4)
    single = np.asarray(
        F.make_fsr_upscaler(16, 24, 32, 48, "quality", impl="xla")(frame)
    )
    np.testing.assert_array_equal(out, single)


def test_esrgan_infer_spatial_int8_matches_single_device():
    """sp inference on the int8 grid: the spatially-sharded quantized
    forward (int8 conv halos over ICI) must match the single-device
    quantized twin bit-near."""
    import jax
    import jax.numpy as jnp

    from nu_scaler_tpu.models import esrgan_lite as el
    from nu_scaler_tpu.parallel import mesh as pmesh

    m = el.ESRGANLiteTPU(upscale=2, stride=2, features=8, blocks=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 64, 32, 3), dtype=np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    scales = el.calibrate_trunk_scales(m, p, np.asarray(x))
    mesh = pmesh.make_mesh(8)
    out_sp = np.asarray(
        pmesh.esrgan_infer_spatial(m, p, x, mesh, quant_scales=scales)
    )
    out_ref = np.asarray(el.make_quant_apply(m, p, scales)(x))
    np.testing.assert_allclose(out_sp, out_ref, rtol=2e-5, atol=2e-5)


def test_interpolate_multi_spatial_matches_single(rng):
    """sp N-factor frame generation: one motion solve, rows sharded over
    the mesh, one mid per t. Must match the single-device math."""
    from nu_scaler_tpu.ops import interpolate as I
    import jax.numpy as jnp

    m = pmesh.make_mesh()
    a = rng.integers(0, 256, (64, 64, 4), np.uint8)
    b = np.roll(a, 3, axis=1)
    ts = (1.0 / 3.0, 2.0 / 3.0)
    out = np.asarray(pmesh.interpolate_multi_spatial(a, b, ts, "flow_soft", m, levels=2))
    assert out.shape == (2, 64, 64, 4)
    flow = I.compute_flow_fast(jnp.asarray(a), jnp.asarray(b), levels=2)
    for i, t in enumerate(ts):
        ref = np.asarray(
            I.warp_blend_fast(jnp.asarray(a), jnp.asarray(b), flow, t, overlap=True)
        )
        np.testing.assert_allclose(out[i].astype(int), ref.astype(int), atol=2)


def test_interpolate_batch_sharded_refined(rng, monkeypatch):
    """dp flow_soft_ref: each chip refines its shard's mids with the
    raw-domain serving graph. Must match the single-device composition."""
    from nu_scaler_tpu.models import interp_refine as ir
    from nu_scaler_tpu.ops import interpolate as I
    import jax.numpy as jnp

    model, params = ir.make_model(features=16, blocks=1)
    monkeypatch.setattr(ir, "load_checkpoint", lambda: (params, 0))
    monkeypatch.setattr(ir, "make_model", lambda features=128, blocks=1: (model, params))
    monkeypatch.setattr(I, "REFINE_MIN_ROWS", 0)  # tiny CPU-mesh frames
    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()

    m = pmesh.make_mesh()
    n = m.devices.size
    pa = rng.integers(0, 256, (n, 32, 64, 4), np.uint8)
    pb = np.roll(pa, 3, axis=2)
    out = np.asarray(
        pmesh.interpolate_batch_sharded(pa, pb, 0.5, "flow_soft_ref", m, levels=2)
    )
    assert out.shape == pa.shape
    ref_fn = ir.get_refine_graph(32, 64)
    for i in range(n):
        a, b = jnp.asarray(pa[i]), jnp.asarray(pb[i])
        flow = I.compute_flow_fast(a, b, levels=2)
        mid = I.warp_blend_fast(a, b, flow, 0.5, overlap=True)
        want = np.asarray(ref_fn(a, b, mid))
        np.testing.assert_allclose(out[i].astype(int), want.astype(int), atol=2)

    ir.get_refine_graph.cache_clear()
    ir.get_refine_phase_graph.cache_clear()


def test_esrgan_batch_sharded_matches_single(rng):
    """dp learned-tier batch: frames sharded over the mesh batch axis, each
    device running the production fused serving graph. Per-frame outputs
    must match the single-frame production path (≤1 LSB for batched-conv
    reduction ties); ragged batches pad by repeating the last frame."""
    from nu_scaler_tpu.models import esrgan_lite as el

    mesh = pmesh.make_mesh()
    imgs = rng.integers(0, 256, (6, 16, 16, 4), np.uint8)  # 6 % 8 != 0: pad path
    out = np.asarray(pmesh.esrgan_batch_sharded(imgs, 32, 32, mesh))
    assert out.shape == (6, 32, 32, 4) and out.dtype == np.uint8
    single = el.make_pretrained_upscaler(16, 16, 32, 32)
    import jax.numpy as jnp

    for i in range(6):
        ref = np.asarray(single(jnp.asarray(imgs[i])))
        diff = np.abs(out[i].astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1
