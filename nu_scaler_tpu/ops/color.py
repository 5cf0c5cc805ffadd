"""On-device YUV 4:2:0 ↔ RGBA conversion — the transfer-minimal live ingest/
delivery format.

The reference's live loop ships full BGRA both ways and swizzles on the CPU
(`/root/reference/nu_scaler_core/src/capture/realtime.rs:463-494`); its GUI
only ever presented a preview-sized QPixmap (`main.py:1117-1173`). On this
TPU the host↔device link is the live bottleneck (49 MB/s dev tunnel,
BASELINE.md), so the pipeline ingests planar 4:2:0 (1.5 B/px — what the
capture/video.py Y4M path already speaks) and can deliver 4:2:0 and/or a
preview resolution, converting on-device.

Numerics follow the BT.601 full-swing goldens in
`nu_scaler_tpu/capture/video.py` (_yuv420_to_rgba/_rgba_to_yuv420):

* chroma 2×2 means and 2× nearest upsamples run as banded matmuls on the
  MXU — `x[::2]`-style strided slicing and (H, 2, W, 2) reshape-means are
  gather/relayout pathologies on this backend (CLAUDE.md). The weights are
  powers of two and the u8 operands are bf16-exact integers, so the
  default-precision matmul accumulates exactly in f32.
* chroma is computed at quarter resolution directly: the color matrix is
  affine in RGB, so chroma(mean(rgb)) == mean(chroma(rgb)) — one exact
  integer downsample instead of two f32 ones.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# BT.601 full-swing (capture/video.py:18-42)
_KR, _KG, _KB = 0.299, 0.587, 0.114


def _nearest_up2_cols(w2: int) -> np.ndarray:
    """[w2, 2*w2] 0/1 matrix: column-nearest 2x upsample as a matmul."""
    m = np.zeros((w2, 2 * w2), np.float32)
    cols = np.arange(2 * w2)
    m[cols // 2, cols] = 1.0
    return m


def _area_down2_cols(w: int) -> np.ndarray:
    """[w, w/2] 0.5 matrix: exact 2x2-mean column pass as a matmul."""
    m = np.zeros((w, w // 2), np.float32)
    rows = np.arange(w)
    m[rows, rows // 2] = 0.5
    return m


@functools.lru_cache(maxsize=16)
def make_yuv420_to_rgba(h: int, w: int):
    """Compiled (y [H,W] u8, u [H/2,W/2] u8, v [H/2,W/2] u8) → RGBA u8
    [H,W,4]; bit-matches capture/video.py:_yuv420_to_rgba up to f32
    fma-association trunc ties."""
    if h % 2 or w % 2:
        raise ValueError(f"4:2:0 needs even dims, got {(h, w)}")
    up_r = jnp.asarray(_nearest_up2_cols(h // 2).T)  # [h, h/2]
    up_c = jnp.asarray(_nearest_up2_cols(w // 2))    # [w/2, w]

    def fn(y, u, v):
        yf = y.astype(jnp.float32)
        uf = up_r @ (u.astype(jnp.float32) - 128.0) @ up_c
        vf = up_r @ (v.astype(jnp.float32) - 128.0) @ up_c
        r = yf + 1.402 * vf
        g = yf - 0.344136 * uf - 0.714136 * vf
        b = yf + 1.772 * uf
        a = jnp.full((h, w), 255.0, jnp.float32)
        # planar → channel-minor once, at the end (u8 [H,W,4] is layout-fine)
        out = jnp.stack([r, g, b, a], axis=-1)
        return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def make_rgba_to_yuv420(h: int, w: int):
    """Compiled RGBA u8 [H,W,4] → (y [H,W], u [H/2,W/2], v [H/2,W/2]) u8;
    bit-matches capture/video.py:_rgba_to_yuv420 up to f32 association
    trunc ties (the golden means f32 chroma; this means exact-integer RGB
    first — identical in real arithmetic, chroma being affine in RGB)."""
    if h % 2 or w % 2:
        raise ValueError(f"4:2:0 needs even dims, got {(h, w)}")
    dn_r = jnp.asarray(_area_down2_cols(h).T)  # [h/2, h]
    dn_c = jnp.asarray(_area_down2_cols(w))    # [w, w/2]

    def fn(rgba):
        rf = rgba[..., 0].astype(jnp.float32)
        gf = rgba[..., 1].astype(jnp.float32)
        bf = rgba[..., 2].astype(jnp.float32)
        y = jnp.clip(_KR * rf + _KG * gf + _KB * bf, 0.0, 255.0).astype(jnp.uint8)
        # exact integer 2x2 means on the MXU, then the affine chroma matrix
        r2 = dn_r @ rf @ dn_c
        g2 = dn_r @ gf @ dn_c
        b2 = dn_r @ bf @ dn_c
        u = jnp.clip(-0.168736 * r2 - 0.331264 * g2 + 0.5 * b2 + 128.0, 0.0, 255.0)
        v = jnp.clip(0.5 * r2 - 0.418688 * g2 - 0.081312 * b2 + 128.0, 0.0, 255.0)
        return y, u.astype(jnp.uint8), v.astype(jnp.uint8)

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def make_delivery_fn(out_h: int, out_w: int, fmt: str = "yuv420",
                     preview_h: int = 0):
    """Compiled delivery-side converter for the live loop: RGBA u8
    [out_h, out_w, 4] → the host-transfer payload.

    fmt: "rgba" (identity — full 4 B/px) or "yuv420" (1.5 B/px planes).
    preview_h > 0 resamples to the preview resolution first (the reference
    GUI only ever blitted a preview-sized pixmap, main.py:1117-1173) —
    same aspect, even dims. Returns None for the identity case so callers
    can skip the extra dispatch.
    """
    from nu_scaler_tpu.ops import resample

    steps = []
    h, w = out_h, out_w
    if preview_h and preview_h < out_h:
        pw = max(2, round(out_w * preview_h / out_h / 2) * 2)
        ph = max(2, (preview_h // 2) * 2)
        steps.append(resample.make_resampler(out_h, out_w, ph, pw, "area"))
        h, w = ph, pw
    if fmt == "yuv420":
        steps.append(make_rgba_to_yuv420(h, w))
    elif fmt != "rgba":
        raise ValueError(f"unknown delivery format {fmt!r}")
    if not steps:
        return None

    def fn(rgba):
        out = rgba
        for s in steps:
            out = s(out)
        return out

    fn.out_hw = (h, w)
    fn.fmt = fmt
    return jax.jit(fn)


def payload_bytes(fmt: str, h: int, w: int) -> int:
    """Host-transfer bytes per frame for the delivery format (the math the
    live bench reports)."""
    return h * w * 4 if fmt == "rgba" else h * w + 2 * (h // 2) * (w // 2)
