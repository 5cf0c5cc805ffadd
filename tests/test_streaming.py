"""Streaming pipeline (double/triple-buffered dispatch)."""

import numpy as np

import jax.numpy as jnp

from nu_scaler_tpu.ops import resample
from nu_scaler_tpu.runtime.streaming import FramePipeline, LivePipeline, benchmark_live_pipeline


def _frames(rng, n, h=16, w=16):
    return [rng.integers(0, 256, (h, w, 4), np.uint8) for _ in range(n)]


def test_frame_pipeline_order_and_results(rng):
    fn = resample.make_resampler(16, 16, 32, 32, "bilinear")
    pipe = FramePipeline(fn, depth=2)
    frames = _frames(rng, 6)
    outs = list(pipe.process_stream(frames))
    assert len(outs) == 6
    for f, o in zip(frames, outs):
        np.testing.assert_array_equal(o, np.asarray(fn(f)))


def test_live_pipeline_interpolation_doubles_frames(rng):
    from nu_scaler_tpu.ops import interpolate as interp

    up = resample.make_resampler(16, 16, 32, 32, "bilinear")
    blend = lambda a, b, t: interp.blend_only(a, b, t)  # noqa: E731
    pipe = LivePipeline(up, blend, depth=1)
    total = []
    for f in _frames(rng, 5):
        total += pipe.put(f)
    total += pipe.drain()
    # 5 inputs: first emits 1, rest emit 2 → 9 outputs
    assert pipe.frames_in == 5
    assert pipe.frames_out == 9
    assert all(o.shape == (32, 32, 4) for o in total)


def test_live_pipeline_no_interp(rng):
    up = resample.make_resampler(16, 16, 32, 32, "nearest")
    pipe = LivePipeline(up, None, depth=2)
    outs = []
    for f in _frames(rng, 4):
        outs += pipe.put(f)
    outs += pipe.drain()
    assert pipe.frames_out == 4


def test_benchmark_live_pipeline(rng):
    up = resample.make_resampler(16, 16, 32, 32, "bilinear")
    stats = benchmark_live_pipeline(up, None, _frames(rng, 10), warmup=2)
    assert stats["output_frames"] == 8
    assert stats["fps"] > 0
    assert stats["p50_step_ms"] >= 0


def test_live_pipeline_amortized_blend(rng):
    from nu_scaler_tpu.ops import interpolate as interp
    from nu_scaler_tpu.ops.metrics import psnr

    up = resample.make_resampler(16, 16, 32, 32, "bilinear")
    blend = lambda a, b, t: interp.blend_only(a, b, t)  # noqa: E731
    frames = _frames(rng, 4)

    naive = LivePipeline(up, blend, depth=1)
    fast = LivePipeline(up, blend, depth=1, amortize_blend=True)
    outs_n, outs_f = [], []
    for f in frames:
        outs_n += naive.put(f)
        outs_f += fast.put(f)
    outs_n += naive.drain()
    outs_f += fast.drain()
    assert len(outs_n) == len(outs_f) == 7
    # blend∘upscale vs upscale∘blend agree up to rounding
    for a, b in zip(outs_n, outs_f):
        assert psnr(np.asarray(a), np.asarray(b)) >= 50.0


def test_live_pipeline_fused_blend_step(rng):
    """LivePipeline with the fused resample+blend kernel: same output count
    and frame contents (to rounding) as the amortized XLA path."""
    from nu_scaler_tpu.kernels.resample_pallas import make_pallas_fused_blend
    from nu_scaler_tpu.ops import interpolate as interp
    from nu_scaler_tpu.ops.metrics import psnr

    h, w = 128, 256
    up = resample.make_resampler(h, w, 2 * h, 2 * w, "lanczos3")
    fb = make_pallas_fused_blend(h, w, 2 * h, 2 * w, "lanczos3", 0.5)
    assert fb is not None
    blend = lambda a, b, t: interp.blend_only(a, b, t)  # noqa: E731

    frames = _frames(rng, 3, h=h, w=w)
    ref = LivePipeline(up, blend, depth=1, amortize_blend=True)
    fused = LivePipeline(up, blend, depth=1, fused_step_fn=fb)
    outs_r, outs_f = [], []
    for f in frames:
        outs_r += ref.put(f)
        outs_f += fused.put(f)
    outs_r += ref.drain()
    outs_f += fused.drain()
    assert len(outs_r) == len(outs_f) == 5
    for a, b in zip(outs_r, outs_f):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape == (2 * h, 2 * w, 4)
        # upscales are bit-exact; mids differ only on f32 rounding ties
        assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1
