"""Serving surgery v4: v3b (select-matmul s2d + 64-in head) ± sparse base,
bf16 quantize, blocks=2. Decides the production serving graph.
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
    head_k_j = jnp.asarray(expand_in_rgba(np.asarray(p["head"]["kernel"], np.float32), ST, 1 / 255.0))
    head_b = jnp.asarray(np.asarray(p["head"]["bias"], np.float32))
    tk, tb = expand_out_rgba(
        np.asarray(p["tail"]["kernel"], np.float32),
        np.asarray(p["tail"]["bias"], np.float32), R, 255.0,
    )
    tail_k, tail_b = jnp.asarray(tk), jnp.asarray(tb)
    base_k_j = jnp.asarray(el._bilinear_base_kernel(4, UP, ST))
    center, terms = el._sparse_base_terms(4, UP, ST)
    center_b = jnp.asarray(center, jnp.bfloat16)
    terms_b = [
        (oy, ox, jnp.asarray(a, jnp.bfloat16), jnp.asarray(bm, jnp.bfloat16))
        for (oy, ox, a, bm) in terms
    ]
    bk = {n: jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), p[n]) for n in p}

    sels = []
    for q in range(ST):
        s = np.zeros((NH, IN_H), np.float32)
        s[np.arange(NH), np.arange(NH) * ST + q] = 1.0
        sels.append(jnp.asarray(s, jnp.bfloat16))

    def s2d_cat(u8):
        x2d = u8.reshape(IN_H, IN_W * 4).astype(jnp.bfloat16)
        return jnp.concatenate(
            [
                jnp.einsum("or,rw->ow", sels[q], x2d).reshape(NH, NW, ST * 4)[None]
                for q in range(ST)
            ],
            axis=-1,
        )

    def graph(u8, sparse=False, blocks=BLOCKS, f32q=True):
        s2d = s2d_cat(u8)
        feat = _conv(s2d, head_k_j, head_b)
        h = feat
        for i in range(blocks):
            blk = bk[f"block{i}"]
            t1 = jax.nn.relu(_conv(h, blk["conv1"]["kernel"], blk["conv1"]["bias"]))
            h = h + jnp.bfloat16(0.2) * _conv(t1, blk["conv2"]["kernel"], blk["conv2"]["bias"])
        h = _conv(h, bk["trunk"]["kernel"], bk["trunk"]["bias"]) + feat
        tail = _conv(h, tail_k, tail_b)
        if sparse:
            base = jnp.einsum("nhwi,io->nhwo", s2d, center_b)
            for oy, ox, a_m, b_m in terms_b:
                sh = el._shift_edge_nhwc(s2d, oy, ox)
                red = jnp.einsum("nhwi,ik->nhwk", sh, a_m)
                base = base + jnp.einsum("nhwk,ko->nhwo", red, b_m)
        else:
            sp = jnp.pad(s2d, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            base = _conv(sp, base_k_j, pad="VALID")
        phases = tail + base
        if f32q:
            ph_u8 = jnp.clip(jnp.round(phases[0].astype(jnp.float32)), 0, 255).astype(jnp.uint8)
        else:
            ph_u8 = jnp.clip(jnp.round(phases[0]), 0, 255).astype(jnp.uint8)
        rows = [
            ph_u8[..., q * R * 4 : (q + 1) * R * 4].reshape(NH, OUT_W, 4)
            for q in range(R)
        ]
        return jnp.stack(rows, axis=1).reshape(OUT_H, OUT_W, 4)

    def chain(u8, out):
        v = jnp.sum(jnp.abs(out.reshape(-1).astype(jnp.float32) - 0.37)) % 2.0
        return jnp.clip(u8.astype(jnp.float32) + v, 0, 255).astype(jnp.uint8)

    for tag, kw in (
        ("v4 dense  b3 f32q", {}),
        ("v4 sparse b3 f32q", dict(sparse=True)),
        ("v4 sparse b3 bf16q", dict(sparse=True, f32q=False)),
        ("v4 sparse b2 f32q", dict(sparse=True, blocks=2)),
    ):
        f = jax.jit(functools.partial(graph, **kw))
        out = np.asarray(f(x_u8))
        err = out[..., :3].astype(np.float64) - ref_out[..., :3].astype(np.float64)
        psnr = 10 * np.log10(255.0**2 / max(float(np.mean(err**2)), 1e-12))
        t = device_timer(lambda s, f=f: chain(s, f(s)), x_u8, 10, ov)
        log(f"{tag}: {t*1000:7.3f} ms ({1.0/t:6.1f} fps)  parity {psnr:5.1f} dB")


if __name__ == "__main__":
    main()
