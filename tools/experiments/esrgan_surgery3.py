"""Serving surgery v3: piecewise timing of s2d-free front-end candidates.

From the v2 lesson (esrgan_surgery2): 4-way-split 16-in head convs are slow
(XLA conv with tiny C_in), eating the matmul-select win. Measure each piece:

  1. slab row-select matmuls alone (4 one-hot einsums)
  2. + bf16 lane concat → s2d tensor (is concat the cost, or the slices?)
  3. head as a 12x12 stride-4 conv on full-res bf16 (replaces s2d+head)
  4. head as 36 shift-matmuls on the 4 slabs (ShiftConv over phase slabs)
  5. full graphs: v3b = selects+concat+64-in head+dense base
               v3a = strided head + strided base
               v3c = selects + shift-head + sparse base

Run on the TPU, background, uninterrupted."""

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
ST, BLOCKS, UP = 4, 3, 2
R = ST * UP
NH, NW = IN_H // ST, IN_W // ST


def _conv(x, k, b=None, pad="SAME", stride=1):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b.astype(x.dtype)


def main() -> None:
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.models import esrgan_lite as el
    from nu_scaler_tpu.models.train import load_checkpoint
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s
    from tools.experiments.esrgan_serving_surgery import expand_in_rgba, expand_out_rgba

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    img = generate_test_pattern(IN_W, IN_H)
    x_u8 = jnp.asarray(img)

    base_fn = el.make_pretrained_upscaler(IN_H, IN_W, OUT_H, OUT_W)
    ref_out = np.asarray(base_fn(x_u8))

    params, _ = load_checkpoint(1, "tpu4")
    p = params["params"] if "params" in params else params
    head_k = expand_in_rgba(np.asarray(p["head"]["kernel"], np.float32), ST, 1 / 255.0)
    head_b = jnp.asarray(np.asarray(p["head"]["bias"], np.float32))
    tk, tb = expand_out_rgba(
        np.asarray(p["tail"]["kernel"], np.float32),
        np.asarray(p["tail"]["bias"], np.float32), R, 255.0,
    )
    tail_k, tail_b = jnp.asarray(tk), jnp.asarray(tb)
    base_k4 = el._bilinear_base_kernel(4, UP, ST)
    bk = {n: jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), p[n]) for n in p}

    # --- strided-kernel forms: 3x3-on-s2d ⇔ 12x12 stride-4 on full-res ---
    def to_strided(k_s2d: np.ndarray) -> np.ndarray:
        """[3, 3, st²·4, O] (s2d channel layout qy·st·4+qx·4+c) →
        [3st, 3st, 4, O] stride-st kernel with the SAME math."""
        _, _, i, o = k_s2d.shape
        out = np.zeros((3 * ST, 3 * ST, 4, o), np.float32)
        for dy in range(3):
            for dx in range(3):
                for qy in range(ST):
                    for qx in range(ST):
                        for c in range(4):
                            out[dy * ST + qy, dx * ST + qx, c, :] = k_s2d[
                                dy, dx, qy * ST * 4 + qx * 4 + c, :
                            ]
        return out

    head_ks = jnp.asarray(to_strided(head_k))
    base_ks = jnp.asarray(to_strided(base_k4))

    sels = []
    for q in range(ST):
        s = np.zeros((NH, IN_H), np.float32)
        s[np.arange(NH), np.arange(NH) * ST + q] = 1.0
        sels.append(jnp.asarray(s, jnp.bfloat16))
    head_k_j = jnp.asarray(head_k)
    base_k_j = jnp.asarray(base_k4)

    def slabs_of(u8):
        x2d = u8.reshape(IN_H, IN_W * 4).astype(jnp.bfloat16)
        return [
            jnp.einsum("or,rw->ow", sels[q], x2d).reshape(NH, NW, ST * 4)[None]
            for q in range(ST)
        ]

    def chain(u8, out):
        # FORCE full materialization: a reduction over the whole output (one
        # fused read pass) — a single-element read lets XLA dead-code-
        # eliminate the rest of the graph (measured: concat variant "0.000 ms")
        v = jnp.sum(jnp.abs(out.reshape(-1).astype(jnp.float32) - 0.37)) % 2.0  # nonlinear: can't fold through convs
        return jnp.clip(u8.astype(jnp.float32) + v, 0, 255).astype(jnp.uint8)

    def timeit(tag, fn, iters=10):
        f = jax.jit(fn)
        t = device_timer(lambda s, f=f: chain(s, f(s)), x_u8, iters, ov)
        log(f"{tag}: {t*1000:7.3f} ms")
        return t

    # 1. slab selects alone
    timeit("1 slab selects x4       ", lambda u8: slabs_of(u8)[0] + slabs_of(u8)[1][0,0,0,0]*0)

    def s2d_cat(u8):
        return jnp.concatenate(slabs_of(u8), axis=-1)

    # 2. + lane concat
    timeit("2 selects + bf16 concat ", s2d_cat)

    # 3. strided head on full-res bf16
    def head_strided(u8):
        xf = u8.astype(jnp.bfloat16)[None]
        xp = jnp.pad(xf, ((0, 0), (ST, ST), (ST, ST), (0, 0)))
        return _conv(xp, head_ks, head_b, pad="VALID", stride=ST)

    timeit("3 head strided 12x12/s4 ", head_strided)

    # 4. shift-matmul head on slabs
    def head_shift(u8):
        slabs = slabs_of(u8)
        out = None
        for q in range(ST):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    sh = el._shift_zero(slabs[q], dy, dx)
                    term = jnp.einsum(
                        "nhwc,co->nhwo", sh,
                        head_k_j[dy + 1, dx + 1, q * 16 : (q + 1) * 16, :].astype(jnp.bfloat16),
                    )
                    out = term if out is None else out + term
        return out + head_b.astype(out.dtype)

    timeit("4 head shift-matmuls    ", head_shift)

    # 4b. 64-in head conv on the concatenated s2d
    def head_cat(u8):
        return _conv(s2d_cat(u8), head_k_j, head_b)

    timeit("4b selects+cat+64in head", head_cat)

    def trunk_tail(feat, blocks=BLOCKS):
        h = feat
        for i in range(blocks):
            blk = bk[f"block{i}"]
            t1 = jax.nn.relu(_conv(h, blk["conv1"]["kernel"], blk["conv1"]["bias"]))
            h = h + jnp.bfloat16(0.2) * _conv(t1, blk["conv2"]["kernel"], blk["conv2"]["bias"])
        h = _conv(h, bk["trunk"]["kernel"], bk["trunk"]["bias"]) + feat
        return _conv(h, tail_k, tail_b)

    def d2s(ph_u8):
        rows = [
            ph_u8[..., q * R * 4 : (q + 1) * R * 4].reshape(NH, OUT_W, 4)
            for q in range(R)
        ]
        return jnp.stack(rows, axis=1).reshape(OUT_H, OUT_W, 4)

    def finish(tail, base):
        phases = tail + base
        ph_u8 = jnp.clip(jnp.round(phases[0].astype(jnp.float32)), 0, 255).astype(jnp.uint8)
        return d2s(ph_u8)

    # full graphs
    def v3a(u8):  # strided head + strided base
        xf = u8.astype(jnp.bfloat16)[None]
        xp = jnp.pad(xf, ((0, 0), (ST, ST), (ST, ST), (0, 0)))
        feat = _conv(xp, head_ks, head_b, pad="VALID", stride=ST)
        tail = trunk_tail(feat)
        xe = jnp.pad(xf, ((0, 0), (ST, ST), (ST, ST), (0, 0)), mode="edge")
        base = _conv(xe, base_ks, pad="VALID", stride=ST)
        return finish(tail, base)

    def v3b(u8):  # selects + concat + 64-in head + dense base on s2d
        s2d = s2d_cat(u8)
        feat = _conv(s2d, head_k_j, head_b)
        tail = trunk_tail(feat)
        sp = jnp.pad(s2d, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        base = _conv(sp, base_k_j, pad="VALID")
        return finish(tail, base)

    for tag, fn in (("v3a strided h+b  ", v3a), ("v3b cat h+dense b", v3b)):
        f = jax.jit(fn)
        out = np.asarray(f(x_u8))
        err = out[..., :3].astype(np.float64) - ref_out[..., :3].astype(np.float64)
        psnr = 10 * np.log10(255.0**2 / max(float(np.mean(err**2)), 1e-12))
        t = device_timer(lambda s, f=f: chain(s, f(s)), x_u8, 10, ov)
        log(f"{tag}: {t*1000:7.3f} ms ({1.0/t:6.1f} fps)  parity {psnr:5.1f} dB")


if __name__ == "__main__":
    main()
