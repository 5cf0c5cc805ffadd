"""Pallas cell-grid soft warp vs its numpy golden + the XLA soft path
(kernels/soft_warp_pallas.py; runs in interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nu_scaler_tpu.kernels import soft_warp_pallas as SW
from nu_scaler_tpu.ops import interpolate as I


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


def test_matches_golden_uniform_flow(rng):
    h, w = 16, 128
    a = rng.integers(0, 256, (h, w, 4), np.uint8)
    b = np.roll(a, 3, axis=1)
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = 3.0
    out = np.asarray(
        SW.soft_warp_blend(jnp.asarray(a), jnp.asarray(b), jnp.asarray(flow), 0.5,
                           tile=(8, 32), rng=8)
    )
    ref = SW.soft_warp_blend_ref(a, b, flow, 0.5, tile=(8, 32), rng=8)
    # kernel weights/fractions run in bf16 (XLA-soft-path precedent): ±1 LSB
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_matches_golden_varying_flow(rng):
    h, w = 24, 96
    a = rng.integers(0, 256, (h, w, 4), np.uint8)
    b = rng.integers(0, 256, (h, w, 4), np.uint8)
    flow = np.zeros((h, w, 2), np.float32)
    # +0.13: keep tile means off exact integers (see soft_warp_blend_ref
    # docstring — floor-boundary ties quantize differently per backend)
    flow[..., 0] = np.linspace(-5, 5, w)[None, :] + 0.13
    flow[..., 1] = np.linspace(-3, 3, h)[:, None] + 0.13
    out = np.asarray(
        SW.soft_warp_blend(jnp.asarray(a), jnp.asarray(b), jnp.asarray(flow), 0.3,
                           tile=(8, 32), rng=8)
    )
    ref = SW.soft_warp_blend_ref(a, b, flow, 0.3, tile=(8, 32), rng=8)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2  # bf16 vs f64 rounding


def test_matches_xla_soft_path_on_uniform_flow(rng):
    """On uniform flow the global-candidate XLA path and the per-corner
    kernel agree exactly (single candidate everywhere)."""
    h, w = 32, 256
    a = rng.integers(0, 256, (h, w, 4), np.uint8)
    a[..., 3] = 255
    b = np.roll(a, 2, axis=1)
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = 2.0
    out_k = np.asarray(
        SW.soft_warp_blend(jnp.asarray(a), jnp.asarray(b), jnp.asarray(flow), 0.5,
                           tile=(8, 32), rng=8)
    )
    out_x = np.asarray(
        I.warp_blend_fast(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(flow), 0.5,
            tile=(8, 32), overlap=True, pallas_ok=False,
        )
    )
    np.testing.assert_array_equal(out_k[..., :3], out_x[..., :3])


def test_warp_blend_fast_routes_to_kernel(monkeypatch, rng):
    """warp_blend_fast(overlap=True) must dispatch the Pallas kernel on
    tile-aligned shapes and fall back on ragged ones."""
    calls = []
    orig = SW.soft_warp_blend

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(
        "nu_scaler_tpu.kernels.soft_warp_pallas.soft_warp_blend", spy
    )
    h, w = 16, 256
    a = jnp.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))
    b = jnp.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))
    flow = jnp.zeros((h, w, 2), jnp.float32)
    out = I.warp_blend_fast(a, b, flow, 0.5, overlap=True)
    assert out.shape == (h, w, 4) and calls  # kernel used

    calls.clear()
    a2 = jnp.asarray(rng.integers(0, 256, (16, 40, 4), np.uint8))
    flow2 = jnp.zeros((16, 40, 2), jnp.float32)
    out2 = I.warp_blend_fast(a2, a2, flow2, 0.5, overlap=True)
    assert out2.shape == (16, 40, 4) and not calls  # ragged: XLA fallback


def test_zero_flow_is_crossfade(rng):
    h, w = 16, 128
    a = rng.integers(0, 256, (h, w, 4), np.uint8)
    b = rng.integers(0, 256, (h, w, 4), np.uint8)
    flow = np.zeros((h, w, 2), np.float32)
    out = np.asarray(
        SW.soft_warp_blend(jnp.asarray(a), jnp.asarray(b), jnp.asarray(flow), 0.25,
                           tile=(8, 32), rng=8)
    )
    expect = np.clip(
        np.round(a.astype(np.float64) * 0.75 + b.astype(np.float64) * 0.25), 0, 255
    )
    assert np.abs(out.astype(float) - expect).max() <= 1.0


def test_seam_reduction_vs_hard_warp(rng):
    """The soft kernel must cut tile-seam error under spatially varying flow
    (the property test_flow_quality gates for the XLA soft path)."""
    h, w = 32, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (
        127.5 + 100 * np.sin(yy * 0.37) * np.cos(xx * 0.23)
    ).astype(np.uint8)[..., None].repeat(4, axis=-1)
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = 4.0 * np.sin(yy * 0.2)  # varies within/between tiles

    # warp a toward itself by the flow: soft vs hard, error vs exact warp
    def exact(img4, fl):
        out = np.zeros((h, w), np.float64)
        ip = np.pad(img4[..., 0], 16, mode="edge").astype(np.float64)
        for r in range(h):
            for c in range(w):
                sy, sx = r + fl[r, c, 1], c + fl[r, c, 0]
                y0, x0 = int(np.floor(sy)), int(np.floor(sx))
                fy, fx = sy - y0, sx - x0
                y0 += 16
                x0 += 16
                out[r, c] = (
                    ip[y0, x0] * (1 - fy) * (1 - fx) + ip[y0, x0 + 1] * (1 - fy) * fx
                    + ip[y0 + 1, x0] * fy * (1 - fx) + ip[y0 + 1, x0 + 1] * fy * fx
                )
        return out

    # t=0.5 with both frames = img warps img by ∓flow twice; compare against
    # the exact per-pixel half-warp average.
    soft = np.asarray(
        SW.soft_warp_blend(
            jnp.asarray(img), jnp.asarray(img), jnp.asarray(2.0 * flow), 0.5,
            tile=(8, 32), rng=8,
        )
    )[..., 0].astype(np.float64)
    gold_pair = 0.5 * exact(img, -flow) + 0.5 * exact(img, flow)
    hard = np.asarray(
        I.block_warp_planar(
            jnp.asarray(img[..., :3].transpose(2, 0, 1).astype(np.float32)),
            jnp.asarray(-flow), tile=(8, 32),
        )
    )[0]
    hard_pair_err = np.abs(hard - exact(img, -flow)).mean()
    soft_err = np.abs(soft - gold_pair).mean()
    assert soft_err < hard_pair_err, (soft_err, hard_pair_err)
