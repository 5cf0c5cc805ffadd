"""Flow-quality hardening gates (VERDICT r1 #7).

* overlapped-tile ("soft") warp must reduce the block-MC seam artifact at
  motion boundaries vs the hard per-tile select
* on a motion-realistic video clip (textured pan + independently moving
  sprite, round-tripped through the y4m reader/writer — the real video
  path), the flow modes must beat the shipped cross-fade on BOTH PSNR and
  SSIM against the true middle frame
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nu_scaler_tpu.capture.video import Y4MReader, Y4MWriter
from nu_scaler_tpu.ops import interpolate as I
from nu_scaler_tpu.ops.metrics import psnr, ssim


def _smooth_noise(rng, h, w, octaves=3):
    """Band-limited texture (natural-image-ish power spectrum)."""
    img = np.zeros((h, w), np.float32)
    for o in range(octaves):
        s = 2 ** (octaves - o)
        small = rng.random((h // s + 2, w // s + 2)).astype(np.float32)
        big = np.kron(small, np.ones((s, s), np.float32))[:h, :w]
        img += big / (o + 1)
    img -= img.min()
    return img / max(img.max(), 1e-6)


def make_clip(h=144, w=256, frames=3, seed=7):
    """Frames with a panning textured background + a sprite moving the other
    way (integer per-frame velocities → frame 1 is the exact ground-truth
    midpoint of frames 0 and 2)."""
    rng = np.random.default_rng(seed)
    margin = 32
    canvas = np.stack(
        [_smooth_noise(rng, h + 2 * margin, w + 2 * margin) for _ in range(3)], -1
    )
    sprite = np.stack([_smooth_noise(rng, 40, 40) for _ in range(3)], -1)
    vy, vx = 1, 2  # background pan per frame
    sy, sx = 2, -3  # sprite velocity per frame
    out = []
    for k in range(frames):
        view = canvas[
            margin + k * vy : margin + k * vy + h,
            margin + k * vx : margin + k * vx + w,
        ].copy()
        py, px = 40 + k * sy, 150 + k * sx
        view[py : py + 40, px : px + 40] = sprite
        fr = np.empty((h, w, 4), np.uint8)
        fr[..., :3] = np.clip(view * 255.0, 0, 255).astype(np.uint8)
        fr[..., 3] = 255
        out.append(fr)
    return out


def test_flow_beats_blend_on_clip(tmp_path):
    frames = make_clip()
    # round-trip through the real y4m video path
    path = str(tmp_path / "clip.y4m")
    wtr = Y4MWriter(path, 256, 144, fps=30.0)
    for f in frames:
        wtr.write(f)
    wtr.close()
    rt = list(Y4MReader(path))
    assert len(rt) == 3 and rt[0].shape == (144, 256, 4)
    f0, truth, f2 = rt

    scores = {}
    for mode in ("blend", "flow", "flow_soft"):
        mid = np.asarray(I.interpolate_frames(f0, f2, 0.5, mode))
        scores[mode] = (psnr(mid, truth), ssim(mid, truth))
    # the designed flow path must beat the shipped cross-fade on both axes
    assert scores["flow"][0] > scores["blend"][0] + 1.0, scores
    assert scores["flow"][1] > scores["blend"][1], scores
    assert scores["flow_soft"][0] > scores["blend"][0] + 1.0, scores
    assert scores["flow_soft"][1] > scores["blend"][1], scores


def test_soft_warp_reduces_tile_seams_under_varying_flow():
    """Spatially varying flow (horizontal shear: x-shift ramps with y) — the
    block-MC tile quantization shows up as staircase seams at every tile row
    with the hard select; the overlapped warp's bilinear tile blending must
    cut that error substantially."""
    rng = np.random.default_rng(3)
    h, w = 64, 256
    pad = 8
    tex = np.stack([_smooth_noise(rng, h, w + 2 * pad) for _ in range(3)], 0)
    img = jnp.asarray(tex[:, :, pad : pad + w] * 255.0, jnp.float32)

    # x-shift varies linearly from -4 (top) to +4 (bottom), constant per row
    shift_y = np.linspace(-4.0, 4.0, h).astype(np.float32)
    offset = np.zeros((h, w, 2), np.float32)
    offset[..., 0] = shift_y[:, None]
    offset_j = jnp.asarray(offset)

    # exact per-row subpixel ground truth via linear interpolation
    truth = np.empty((3, h, w), np.float32)
    for r in range(h):
        s = shift_y[r]
        s0, f = int(np.floor(s)), s - np.floor(s)
        row = tex[:, r, :] * 255.0
        a = row[:, pad + s0 : pad + s0 + w]
        b = row[:, pad + s0 + 1 : pad + s0 + 1 + w]
        truth[:, r, :] = a + f * (b - a)

    hard = np.asarray(I.block_warp_planar(img, offset_j, tile=(8, 32)))
    soft = np.asarray(I.block_warp_planar(img, offset_j, tile=(8, 32), overlap=True))

    err_hard = float(np.abs(hard - truth).mean())
    err_soft = float(np.abs(soft - truth).mean())
    # staircase seams gone: at least 2x error reduction on the smooth ramp
    assert err_soft < 0.5 * err_hard, (err_soft, err_hard)


def test_soft_warp_pq_split_close_to_exact():
    """The production soft warp evaluates Q's coefficients one lane right of
    their output pixel (aligned P/Q accumulators — see
    _soft_warp_accumulate). Against the EXACT per-candidate bilinear form
    the error must stay at the bf16-LSB scale on smooth motion (the
    coefficient fields are continuous at tile scale)."""
    rng = np.random.default_rng(11)
    h, w = 64, 256
    img = jnp.asarray(rng.random((3, h, w)).astype(np.float32) * 255.0)
    off = np.zeros((h, w, 2), np.float32)
    off[..., 0] = np.linspace(-6.0, 6.0, h)[:, None]  # smooth shear
    off[..., 1] = 1.3
    offj = jnp.asarray(off)

    got = np.asarray(I.block_warp_planar(img, offj, tile=(8, 32), overlap=True))

    # exact reference: per-candidate bilinear lerp with the same candidates,
    # weights and smooth fractions (f64 numpy)
    from nu_scaler_tpu.ops.interpolate import (
        WARP_K, WARP_RANGE, _tile_mean, _tile_to_pixels, _shift_edge)
    import jax

    th, tw = 8, 32
    tiles = np.asarray(_tile_mean(offj, th, tw))
    tiles = np.clip(tiles, -WARP_RANGE, WARP_RANGE)
    q = np.floor(tiles).astype(np.int32)
    side = 2 * WARP_RANGE + 2
    ids = (q[..., 1] + WARP_RANGE) * side + (q[..., 0] + WARP_RANGE)
    hist = np.bincount(ids.reshape(-1), minlength=side * side)
    top = np.argsort(-hist, kind="stable")[:WARP_K]
    cand_y = top // side - WARP_RANGE
    cand_x = top % side - WARP_RANGE
    d2 = (q[..., 1, None] - cand_y) ** 2 + (q[..., 0, None] - cand_x) ** 2
    assign = np.argmin(d2, axis=-1)

    pad = WARP_RANGE + 2
    padded = np.pad(np.asarray(img), ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    hh, hw = th // 2, tw // 2
    fyv = (((np.arange(h) + 0.5) / th - 0.5) % 1.0)[:, None]
    fxv = (((np.arange(w) + 0.5) / tw - 0.5) % 1.0)[None, :]

    def rep(f):
        return np.asarray(_tile_to_pixels(jnp.asarray(f), th, tw, h, w))

    def sh(a, dy, dx):
        return np.asarray(_shift_edge(_shift_edge(jnp.asarray(a), dy, 0), dx, 1))

    a_px = rep(assign.astype(np.float64))
    a_tl = sh(a_px, -hh, -hw); a_tr = sh(a_px, -hh, tw - hw)
    a_bl = sh(a_px, th - hh, -hw); a_br = sh(a_px, th - hh, tw - hw)
    sxr = rep(tiles[..., 0]); syr = rep(tiles[..., 1])
    smooth_x = (1 - fxv) * ((1 - fyv) * sh(sxr, -hh, -hw) + fyv * sh(sxr, th - hh, -hw)) + \
        fxv * ((1 - fyv) * sh(sxr, -hh, tw - hw) + fyv * sh(sxr, th - hh, tw - hw))
    smooth_y = (1 - fxv) * ((1 - fyv) * sh(syr, -hh, -hw) + fyv * sh(syr, th - hh, -hw)) + \
        fxv * ((1 - fyv) * sh(syr, -hh, tw - hw) + fyv * sh(syr, th - hh, tw - hw))

    ref = np.zeros((3, h, w))
    for i in range(WARP_K):
        slab = padded[:, pad + cand_y[i] : pad + cand_y[i] + h + 1,
                      pad + cand_x[i] : pad + cand_x[i] + w + 1]
        wk = (1 - fyv) * ((a_tl == i) * (1 - fxv) + (a_tr == i) * fxv) + \
            fyv * ((a_bl == i) * (1 - fxv) + (a_br == i) * fxv)
        fx = np.clip(smooth_x - cand_x[i], 0, 1)
        fy = np.clip(smooth_y - cand_y[i], 0, 1)
        top_r = slab[:, :h, :w] + fx * (slab[:, :h, 1:] - slab[:, :h, :w])
        bot_r = slab[:, 1:, :w] + fx * (slab[:, 1:, 1:] - slab[:, 1:, :w])
        ref = ref + wk * (top_r + fy * (bot_r - top_r))

    err = np.abs(got - ref)
    assert err.mean() < 1.0 and np.percentile(err, 99) < 4.0, (
        err.mean(), np.percentile(err, 99), err.max())


def test_flow_soft_api():
    import nu_scaler_core as nsc

    it = nsc.create_interpolator("flow_soft")
    assert it.mode == "flow_soft"
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (32, 64, 4), np.uint8)
    b = np.roll(a, 2, axis=1)
    out = it.interpolate_py(a.tobytes(), b.tobytes(), 64, 32)
    assert len(out) == 64 * 32 * 4
    assert it.get_last_gpu_duration_ms() > 0
