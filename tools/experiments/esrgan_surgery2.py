"""Serving surgery v2: kill the s2d relayout (2.32 ms of the 5.5 ms ladder,
esrgan_prefix_profile) by never materializing the s2d tensor:

  * row-phase selection as 4 one-hot [nh, H] @ [H, W·4] MXU matmuls (the
    banded-resampler trick — one-hot weights are exact in bf16) giving 4
    phase slabs [nh, nw, st·4] via FREE column reshapes,
  * head conv split along its input-phase rows: feat = Σ_p conv(slab_p,
    head_k[:, :, p·16:(p+1)·16, :]) — no concat anywhere,
  * fixed bilinear base likewise split 4-way (dense) or structured-sparse.

Variants: E fused-v2 dense base | F v2 sparse base | G v2 blocks=2 timing.
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


def _conv(x, k, b=None, pad="SAME"):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), pad,
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
    base_k4 = el._bilinear_base_kernel(4, UP, ST)  # [3,3,64,256] RGBA raw
    bk = {n: jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), p[n]) for n in p}

    # one-hot row-phase selectors S_p [NH, IN_H]
    sels = []
    for q in range(ST):
        s = np.zeros((NH, IN_H), np.float32)
        s[np.arange(NH), np.arange(NH) * ST + q] = 1.0
        sels.append(jnp.asarray(s, jnp.bfloat16))

    head_k_p = [jnp.asarray(head_k[:, :, q * 16 : (q + 1) * 16, :]) for q in range(ST)]
    base_k_p = [jnp.asarray(base_k4[:, :, q * 16 : (q + 1) * 16, :]) for q in range(ST)]

    # sparse base decomposition of base_k4 (center 1x1 + neighbor terms)
    center, terms = el._sparse_base_terms(4, UP, ST)
    center_b = jnp.asarray(center, jnp.bfloat16)
    terms_b = [
        (oy, ox, jnp.asarray(a, jnp.bfloat16), jnp.asarray(bm, jnp.bfloat16))
        for (oy, ox, a, bm) in terms
    ]
    log(f"sparse base: center {center.shape}, terms "
        + str([(oy, ox, a.shape[1]) for (oy, ox, a, _b) in terms]))

    def slabs_of(u8):
        x2d = u8.reshape(IN_H, IN_W * 4).astype(jnp.bfloat16)
        out = []
        for q in range(ST):
            sl = jnp.einsum("or,rw->ow", sels[q], x2d)  # [NH, W*4] bf16 raw
            out.append(sl.reshape(NH, NW, ST * 4)[None])
        return out

    def trunk_and_tail(feat):
        h = feat
        for i in range(BLOCKS):
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

    def fused_v2(u8, sparse_base=False, blocks=BLOCKS):
        slabs = slabs_of(u8)
        feat = None
        for q in range(ST):
            t = _conv(slabs[q], head_k_p[q])
            feat = t if feat is None else feat + t
        feat = feat + head_b.astype(feat.dtype)
        # trunk
        h = feat
        for i in range(blocks):
            blk = bk[f"block{i}"]
            t1 = jax.nn.relu(_conv(h, blk["conv1"]["kernel"], blk["conv1"]["bias"]))
            h = h + jnp.bfloat16(0.2) * _conv(t1, blk["conv2"]["kernel"], blk["conv2"]["bias"])
        h = _conv(h, bk["trunk"]["kernel"], bk["trunk"]["bias"]) + feat
        tail = _conv(h, tail_k, tail_b)
        if sparse_base:
            s2d = jnp.concatenate(slabs, axis=-1)  # only for sparse path
            base = jnp.einsum("nhwi,io->nhwo", s2d, center_b)
            for oy, ox, a_m, b_m in terms_b:
                sh = el._shift_edge_nhwc(s2d, oy, ox)
                red = jnp.einsum("nhwi,ik->nhwk", sh, a_m)
                base = base + jnp.einsum("nhwk,ko->nhwo", red, b_m)
        else:
            base = None
            for q in range(ST):
                sp = jnp.pad(slabs[q], ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
                t = _conv(sp, base_k_p[q], pad="VALID")
                base = t if base is None else base + t
        phases = tail + base
        ph_u8 = jnp.clip(jnp.round(phases[0].astype(jnp.float32)), 0, 255).astype(jnp.uint8)
        return d2s(ph_u8)

    def chain(u8, out):
        return jnp.clip(
            u8.astype(jnp.int32) + out[0, 0, 0].astype(jnp.int32) % 2, 0, 255
        ).astype(jnp.uint8)

    for tag, kw in (
        ("E v2 dense base ", {}),
        ("F v2 sparse base", dict(sparse_base=True)),
        ("G v2 blocks=2   ", dict(blocks=2)),
    ):
        f = jax.jit(functools.partial(fused_v2, **kw))
        out = np.asarray(f(x_u8))
        err = out[..., :3].astype(np.float64) - ref_out[..., :3].astype(np.float64)
        mse = float(np.mean(err**2))
        psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
        t = device_timer(lambda s, f=f: chain(s, f(s)), x_u8, 10, ov)
        log(f"{tag}: {t*1000:7.3f} ms ({1.0/t:6.1f} fps)  parity {psnr:5.1f} dB "
            f"max|Δ| {np.abs(err).max():.0f}")


if __name__ == "__main__":
    main()
