"""Serving-graph surgery candidates for the learned quality tier (VERDICT r3
item 1): measured splits last round were s2d 2.3 ms + tail overheads 1.55 ms
(alpha 0.79, concat+d2s 0.80, quantize 0.35) on tpu4's 6.5 ms frame.

Variants measured here (1080p→4K, tpu4 = stride4/C128/blocks3):
  A. baseline: current make_pretrained_upscaler
  B. u8 slab s2d alone (row-phase slices + lane concat) vs the bf16 path
  C. FUSED graph: u8 s2d → raw-domain convs (1/255 absorbed in head kernel)
     → RGBA-interleaved expanded tail+base kernels (alpha rides the fixed
     base bilinearly; no concat, no separate alpha matmul) → raw quantize →
     free-reshape d2s. PSNR parity vs A on RGB.
  D. C with blocks=2 (timing only — quality needs retrain)

Run on the TPU, background, uninterrupted.
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


IN_H, IN_W, OUT_H, OUT_W = 1080, 1920, 2160, 3840
ST, C_FEAT, BLOCKS, UP = 4, 128, 3, 2
R = ST * UP  # output phases per trunk cell


def _conv(x, k, b=None, pad="SAME"):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b.astype(x.dtype)


def expand_in_rgba(k: np.ndarray, st: int, scale: float) -> np.ndarray:
    """HWIO kernel with I = st²·3 (RGB s2d) → I' = st²·4 (RGBA s2d), alpha
    rows zero, all weights scaled (absorbs the 1/255 input normalization)."""
    kh, kw, i3, o = k.shape
    out = np.zeros((kh, kw, st * st * 4, o), np.float32)
    for qy in range(st):
        for qx in range(st):
            src = (qy * st + qx) * 3
            dst = (qy * st + qx) * 4
            out[:, :, dst : dst + 3, :] = k[:, :, src : src + 3, :] * scale
    return out


def expand_out_rgba(k: np.ndarray, b: np.ndarray, r: int, scale: float):
    """HWIO kernel with O = r²·3 phase-major RGB → O' = r²·4 RGBA-interleaved
    (alpha outputs zero), scaled by `scale` (255: raw-domain output)."""
    kh, kw, i, o3 = k.shape
    out = np.zeros((kh, kw, i, r * r * 4), np.float32)
    ob = np.zeros((r * r * 4,), np.float32)
    for p in range(r * r):
        out[:, :, :, p * 4 : p * 4 + 3] = k[:, :, :, p * 3 : p * 3 + 3] * scale
        ob[p * 4 : p * 4 + 3] = b[p * 3 : p * 3 + 3] * scale
    return out, ob


def main() -> None:
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.models import esrgan_lite as el
    from nu_scaler_tpu.models.train import load_checkpoint
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    img = generate_test_pattern(IN_W, IN_H)
    x_u8 = jnp.asarray(img)

    def chain(u8, out):
        return jnp.clip(
            u8.astype(jnp.int32) + out[0, 0, 0].astype(jnp.int32) % 2, 0, 255
        ).astype(jnp.uint8)

    # ---------------- A. baseline ----------------
    base_fn = el.make_pretrained_upscaler(IN_H, IN_W, OUT_H, OUT_W)
    log(f"baseline arch: {base_fn.arch}")
    t = device_timer(lambda s: chain(s, base_fn(s)), x_u8, 10, ov)
    log(f"A baseline end-to-end: {t*1000:7.3f} ms ({1.0/t:6.1f} fps)")
    ref_out = np.asarray(base_fn(x_u8))

    # ---------------- B. s2d variants ----------------
    nh, nw = IN_H // ST, IN_W // ST

    def s2d_bf16_current(u8):
        # what the serving path does today: full-res channel-minor bf16
        rgb = u8[None, ..., :3].astype(jnp.bfloat16) * jnp.bfloat16(1 / 255)
        s = rgb.reshape(1, nh, ST, nw, ST, 3)
        return s.transpose(0, 1, 3, 2, 4, 5).reshape(1, nh, nw, ST * ST * 3)

    def s2d_u8_slab(u8):
        xr = u8.reshape(nh, ST, IN_W * 4)
        parts = [xr[:, p, :].reshape(nh, nw, ST * 4) for p in range(ST)]
        return jnp.concatenate(parts, axis=-1)  # [nh, nw, st²·4] u8

    def s2d_u8_transpose(u8):
        s = u8.reshape(nh, ST, nw, ST, 4)
        return s.transpose(0, 2, 1, 3, 4).reshape(nh, nw, ST * ST * 4)

    for name, fn in (
        ("bf16 full-res (current)", s2d_bf16_current),
        ("u8 slab slices", s2d_u8_slab),
        ("u8 reshape/transpose", s2d_u8_transpose),
    ):
        f = jax.jit(lambda u8, fn=fn: fn(u8))
        t = device_timer(lambda s, f=f: chain(s, f(s).reshape(-1, 4)[None]), x_u8, 20, ov)
        log(f"B s2d[{name:24s}]: {t*1000:7.3f} ms")

    # layout check: slab trick must equal reshape/transpose exactly
    sa = np.asarray(jax.jit(s2d_u8_slab)(x_u8))
    sb = np.asarray(jax.jit(s2d_u8_transpose)(x_u8))
    assert np.array_equal(sa, sb), "slab s2d layout mismatch"
    log("B s2d slab layout == reshape/transpose: OK")

    # ---------------- C. fused graph ----------------
    params, step = load_checkpoint(1, "tpu4")
    p = params["params"] if "params" in params else params
    log(f"tpu4 checkpoint step {step}; keys: {sorted(p.keys())}")

    head_k = expand_in_rgba(np.asarray(p["head"]["kernel"], np.float32), ST, 1 / 255.0)
    head_b = np.asarray(p["head"]["bias"], np.float32)
    tail_k, tail_b = expand_out_rgba(
        np.asarray(p["tail"]["kernel"], np.float32),
        np.asarray(p["tail"]["bias"], np.float32), R, 255.0,
    )
    base_k = el._bilinear_base_kernel(4, UP, ST)  # RGBA in/out, raw domain

    bk = {
        name: jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), p[name])
        for name in p
    }

    def fused(u8, blocks=BLOCKS, dtype=jnp.bfloat16):
        s2d = s2d_u8_slab(u8)[None]  # [1, nh, nw, 64] u8
        x = s2d.astype(dtype)  # raw 0..255 (bf16-exact)
        feat = _conv(x, jnp.asarray(head_k), jnp.asarray(head_b))
        h = feat
        for i in range(blocks):
            blk = bk[f"block{i}"]
            t1 = _conv(h, jnp.asarray(blk["conv1"]["kernel"]), jnp.asarray(blk["conv1"]["bias"]))
            t1 = jax.nn.relu(t1)
            t2 = _conv(t1, jnp.asarray(blk["conv2"]["kernel"]), jnp.asarray(blk["conv2"]["bias"]))
            h = h + jnp.asarray(0.2, dtype) * t2
        h = _conv(h, jnp.asarray(bk["trunk"]["kernel"]), jnp.asarray(bk["trunk"]["bias"])) + feat
        tail = _conv(h, jnp.asarray(tail_k), jnp.asarray(tail_b))
        xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        base = _conv(xpad, jnp.asarray(base_k), pad="VALID")
        phases = tail + base  # [1, nh, nw, r²·4] raw-scale
        ph_u8 = jnp.clip(jnp.round(phases[0].astype(jnp.float32)), 0, 255).astype(jnp.uint8)
        rows = [
            ph_u8[..., q * R * 4 : (q + 1) * R * 4].reshape(nh, OUT_W, 4)
            for q in range(R)
        ]
        return jnp.stack(rows, axis=1).reshape(OUT_H, OUT_W, 4)

    fused_j = jax.jit(fused)
    out_c = np.asarray(fused_j(x_u8))
    rgb_err = out_c[..., :3].astype(np.float64) - ref_out[..., :3].astype(np.float64)
    mse = float(np.mean(rgb_err**2))
    psnr = 10 * np.log10(255.0**2 / mse) if mse > 0 else 99.0
    log(f"C fused parity vs baseline: RGB PSNR {psnr:.1f} dB "
        f"(max|Δ| {np.abs(rgb_err).max():.0f})")
    t = device_timer(lambda s: chain(s, fused_j(s)), x_u8, 10, ov)
    log(f"C fused end-to-end: {t*1000:7.3f} ms ({1.0/t:6.1f} fps)")

    # quantize variant: bf16-native round (skip the f32 hop)
    def fused_bf16q(u8):
        s2d = s2d_u8_slab(u8)[None]
        x = s2d.astype(jnp.bfloat16)
        feat = _conv(x, jnp.asarray(head_k), jnp.asarray(head_b))
        h = feat
        for i in range(BLOCKS):
            blk = bk[f"block{i}"]
            t1 = jax.nn.relu(_conv(h, jnp.asarray(blk["conv1"]["kernel"]), jnp.asarray(blk["conv1"]["bias"])))
            h = h + jnp.asarray(0.2, jnp.bfloat16) * _conv(t1, jnp.asarray(blk["conv2"]["kernel"]), jnp.asarray(blk["conv2"]["bias"]))
        h = _conv(h, jnp.asarray(bk["trunk"]["kernel"]), jnp.asarray(bk["trunk"]["bias"])) + feat
        tail = _conv(h, jnp.asarray(tail_k), jnp.asarray(tail_b))
        xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        phases = tail + _conv(xpad, jnp.asarray(base_k), pad="VALID")
        ph_u8 = jnp.clip(jnp.round(phases[0]), 0, 255).astype(jnp.uint8)
        rows = [
            ph_u8[..., q * R * 4 : (q + 1) * R * 4].reshape(nh, OUT_W, 4)
            for q in range(R)
        ]
        return jnp.stack(rows, axis=1).reshape(OUT_H, OUT_W, 4)

    fq = jax.jit(fused_bf16q)
    out_q = np.asarray(fq(x_u8))
    err_q = out_q[..., :3].astype(np.float64) - ref_out[..., :3].astype(np.float64)
    mseq = float(np.mean(err_q**2))
    log(f"C2 bf16-quantize parity: {10*np.log10(255.0**2/max(mseq,1e-12)):.1f} dB")
    t = device_timer(lambda s: chain(s, fq(s)), x_u8, 10, ov)
    log(f"C2 fused bf16-quantize: {t*1000:7.3f} ms ({1.0/t:6.1f} fps)")

    # ---------------- D. blocks=2 timing ----------------
    f2 = jax.jit(functools.partial(fused, blocks=2))
    _ = f2(x_u8)
    t = device_timer(lambda s: chain(s, f2(s)), x_u8, 10, ov)
    log(f"D fused blocks=2 (timing only): {t*1000:7.3f} ms ({1.0/t:6.1f} fps)")


if __name__ == "__main__":
    main()
