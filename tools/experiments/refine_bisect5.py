"""Refinement d2s, part 5: fuse the d2s INTO the 4K upscale's banded
passes, consuming the [nh, nw, q, st·4] phase tensor directly.

Key identity: the d2s row de-interleave maps phase row (n, q) to full-res
row 4n+q — the row-major (n, q) flatten IS the original row index, so the
upscaler's banded weight blocks are unchanged; only the tap axis s is
reinterpreted as (s_n, q) (requires stride and halo divisible by st). The
column pass likewise folds the column phase p out of the lane dim. Both
passes contract q/p on the MXU instead of relaying lanes into rows — the
relayout refine_bisect3/4 measured at ~2-5 ms never happens, and the
separate d2s matmul disappears.

Variants:
  E. phase-domain banded up (v-pass folds q, h-pass folds p), split_bf16
  F. control: committed path (S3 dot_general d2s -> u8 -> make_resampler)

Run on the TPU, background, uninterrupted."""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def _banded_rounded(w: np.ndarray, st: int, target_tc: int = 128):
    """_banded_from_matrix with halo rounded UP to a multiple of st so the
    slab blocks along the phase-major axis in whole trunk cells."""
    import math

    out_size, in_size = w.shape
    g = math.gcd(in_size, out_size)
    p, q = out_size // g, in_size // g
    tc = max(p, ((target_tc + p - 1) // p) * p)
    if tc >= out_size:
        return None
    stride = tc * q // p
    if stride % st:
        return None
    t = -(-out_size // tc)

    lo = np.full(out_size, in_size, np.int64)
    hi = np.full(out_size, -1, np.int64)
    rows, cols = np.nonzero(w)
    np.minimum.at(lo, rows, cols)
    np.maximum.at(hi, rows, cols)

    tiles = np.arange(out_size) // tc
    halo = int(max(0, (tiles * stride - lo).max()))
    halo = ((halo + st - 1) // st) * st
    tail = int(max(0, (hi - (tiles + 1) * stride + 1).max()))
    if halo + tail > stride:
        return None

    s2 = 2 * stride
    a = np.zeros((t, s2, tc), dtype=np.float32)
    for o in range(out_size):
        ti = o // tc
        pl_ = o % tc
        base = ti * stride - halo
        l_, h_ = int(lo[o]), int(hi[o])
        if h_ < l_:
            continue
        a[ti, l_ - base : h_ - base + 1, pl_] = w[o, l_ : h_ + 1]
    return a, stride, halo, tc, t


def main() -> None:
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.models import interp_refine as ir
    from nu_scaler_tpu.models import esrgan_lite as el
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.ops.resample import _axis_weights, _split_bf16
    from nu_scaler_tpu.utils.tracing import device_timer

    h, w = 1080, 1920
    oh, ow = 2160, 3840
    st = 4
    nh, nw = h // st, w // st
    img = generate_test_pattern(w, h)
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    log(f"device {jax.devices()[0]}")

    # --- the committed refine graph, split so we can tap the phase tensor
    restored = ir.load_checkpoint()
    params, _ = restored
    p = params["params"] if "params" in params else params
    dtype = jnp.bfloat16

    hk = np.asarray(p["head"]["kernel"], np.float32)
    F = hk.shape[-1]
    hk12 = np.zeros((3, 3, st * st * 12, F), np.float32)
    for q in range(st * st):
        for f in range(3):
            hk12[:, :, q * 12 + f * 4 : q * 12 + f * 4 + 3, :] = (
                hk[:, :, q * 9 + f * 3 : q * 9 + f * 3 + 3, :] / 255.0
            )
    head_k = jnp.asarray(hk12)
    head_b = jnp.asarray(np.asarray(p["head"]["bias"], np.float32))
    k1 = jnp.asarray(np.asarray(p["block0"]["conv1"]["kernel"], np.float32))
    b1 = jnp.asarray(np.asarray(p["block0"]["conv1"]["bias"], np.float32))
    k2 = jnp.asarray(np.asarray(p["block0"]["conv2"]["kernel"], np.float32))
    b2 = jnp.asarray(np.asarray(p["block0"]["conv2"]["bias"], np.float32))
    tk = np.asarray(p["tail"]["kernel"], np.float32) * 255.0
    tb = np.asarray(p["tail"]["bias"], np.float32) * 255.0
    tk4 = np.zeros(tk.shape[:3] + (st * st * 4,), np.float32)
    tb4 = np.zeros((st * st * 4,), np.float32)
    for q in range(st * st):
        tk4[..., q * 4 : q * 4 + 3] = tk[..., q * 3 : q * 3 + 3]
        tb4[q * 4 : q * 4 + 3] = tb[q * 3 : q * 3 + 3]
    tail_k = jnp.asarray(tk4)
    tail_b = jnp.asarray(tb4)
    sels = el._row_phase_selectors(h, st)

    def conv(x, k, b=None):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y if b is None else y + b.astype(x.dtype)

    def out_phase(a_u8, b_u8, mid_u8):
        x = jnp.concatenate([a_u8, b_u8, mid_u8], axis=-1)
        x2d = x.reshape(h, w * 12).astype(dtype)
        s2d = jnp.concatenate(
            [
                jnp.einsum("or,rw->ow", sels[q].astype(dtype), x2d)
                .reshape(nh, nw, st * 12)[None]
                for q in range(st)
            ],
            axis=-1,
        )
        hh = conv(s2d, head_k, head_b)
        t1 = jax.nn.relu(conv(hh, k1, b1))
        hh = hh + jnp.asarray(0.2, hh.dtype) * conv(t1, k2, b2)
        mid2d = mid_u8.reshape(h, w * 4).astype(dtype)
        mid_ph = jnp.concatenate(
            [
                jnp.einsum("or,rw->ow", sels[q].astype(dtype), mid2d)
                .reshape(nh, nw, st * 4)
                for q in range(st)
            ],
            axis=-1,
        )
        tail = conv(hh, tail_k)[0]
        return jnp.clip(
            jnp.round(
                tail.astype(jnp.float32) + tail_b
                + mid_ph.astype(jnp.float32)
            ),
            0, 255,
        )  # f32 [nh, nw, 64], integer-valued

    # --- phase-domain banded upscale -------------------------------------
    wv = _axis_weights(h, oh, "lanczos3")   # [oh, h]
    wh = _axis_weights(w, ow, "lanczos3")   # [ow, w]
    bv = _banded_rounded(wv, st)
    bh = _banded_rounded(wh, st)
    assert bv is not None and bh is not None, "banded form must exist"
    av, stride_v, halo_v, tc_v, t_v = bv
    ah, stride_h, halo_h, tc_h, t_h = bh
    log(f"v: stride {stride_v} halo {halo_v} tc {tc_v} t {t_v}; "
        f"h: stride {stride_h} halo {halo_h} tc {tc_h} t {t_h}")
    # fold the tap axis s -> (s_n, q)
    av4 = av.reshape(t_v, 2 * stride_v // st, st, tc_v)
    ah4 = ah.reshape(t_h, 2 * stride_h // st, st, tc_h)
    av4_hi, av4_lo = _split_bf16(av4)
    ah4_hi, ah4_lo = _split_bf16(ah4)

    def phase_up(ph):  # ph: f32 [nh, nw, st*st*4] integer-valued 0..255
        ph4 = ph.astype(dtype).reshape(nh, nw, st, st * 4)
        # v-pass: pad + block along n, contract (s_n, q)
        total_n = (t_v + 1) * (stride_v // st)
        pad_hd = halo_v // st
        ph4p = jnp.pad(
            ph4, [(pad_hd, total_n - pad_hd - nh), (0, 0), (0, 0), (0, 0)]
        )
        blocks = ph4p.reshape(t_v + 1, stride_v // st, nw, st, st * 4)
        slab = jnp.concatenate([blocks[:-1], blocks[1:]], axis=1)
        y1 = jnp.einsum("tsqp,tswql->tpwl", av4_hi, slab,
                        preferred_element_type=jnp.float32)
        y1 = y1 + jnp.einsum("tsqp,tswql->tpwl", av4_lo, slab,
                             preferred_element_type=jnp.float32)
        y1 = y1.reshape(t_v * tc_v, nw, st * 4)[:oh]  # [oh, nw, 16] f32
        # h-pass: fold p out of the lanes, contract (s_w, p)
        x = y1.astype(dtype).reshape(oh, nw, st, 4)
        total_w = (t_h + 1) * (stride_h // st)
        pad_hd = halo_h // st
        xp = jnp.pad(x, [(0, 0), (pad_hd, total_w - pad_hd - nw), (0, 0), (0, 0)])
        blocks = xp.reshape(oh, t_h + 1, stride_h // st, st, 4)
        slab = jnp.concatenate([blocks[:, :-1], blocks[:, 1:]], axis=2)
        y2 = jnp.einsum("tsqp,htsqc->htpc", ah4_hi, slab,
                        preferred_element_type=jnp.float32)
        y2 = y2 + jnp.einsum("tsqp,htsqc->htpc", ah4_lo, slab,
                             preferred_element_type=jnp.float32)
        y2 = y2.reshape(oh, t_h * tc_h, 4)[:, :ow]
        return jnp.trunc(jnp.clip(y2, 0.0, 255.0)).astype(jnp.uint8)

    # --- control: committed S3 d2s -> u8 -> resampler --------------------
    s3_np = np.zeros((h, nh, st), np.float32)
    for r in range(h):
        s3_np[r, r // st, r % st] = 1.0
    S3 = jnp.asarray(s3_np, dtype)
    up = resample.make_resampler(h, w, oh, ow, "lanczos3")

    def d2s_u8(ph):
        ph4 = ph.astype(dtype).reshape(nh, nw, st, st * 4)
        out3 = jax.lax.dot_general(
            S3, ph4, (((1, 2), (0, 2)), ((), ())),
            preferred_element_type=dtype,
        )
        return out3.reshape(h, w, 4).astype(jnp.uint8)

    state0 = (a0, b0, jnp.zeros((), jnp.float32))

    def t_body(make_out, label, iters=10):
        def body(state):
            prev, cur, acc = state
            out4k = make_out(prev, cur)
            acc = acc + jnp.sum(out4k[:1, :8, 0].astype(jnp.float32))
            pert = jnp.max(out4k[0, :8, 0]).astype(jnp.int32) % 2
            nxt = jnp.clip(cur.astype(jnp.int32) + pert, 0, 255).astype(jnp.uint8)
            return (cur, nxt, acc)

        t = device_timer(body, state0, iters=iters) * 1e3
        log(f"{label:46s}: {t:7.3f} ms")
        return t

    t_body(lambda a, b: phase_up(out_phase(a, b, a)), "E net + phase-domain banded up")
    t_body(lambda a, b: up(d2s_u8(out_phase(a, b, a))), "F control: net + S3 d2s + resampler")

    # parity: E vs F (same weights, different summation order; expect tiny)
    e = np.asarray(jax.jit(lambda a, b: phase_up(out_phase(a, b, a)))(a0, b0))
    f = np.asarray(jax.jit(lambda a, b: up(d2s_u8(out_phase(a, b, a))))(a0, b0))
    diff = np.abs(e.astype(np.int32) - f.astype(np.int32))
    mse = float(np.mean((e.astype(np.float64) - f.astype(np.float64)) ** 2))
    psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
    log(f"parity E vs F: max|Δ|={diff.max()}  mean={diff.mean():.6f}  PSNR {psnr:.1f} dB")


if __name__ == "__main__":
    main()
