"""Serving surgery v6: head/base conv lane efficiency. The 64-in head conv
runs at ~33 TF/s vs the 128-in blocks' ~108 TF/s; zero-padding the s2d to
128 channels doubles its FLOPs but may still win on the MXU. Same question
for the dense base. Run on the TPU, background, uninterrupted."""

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

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    img = generate_test_pattern(IN_W, IN_H)
    x_u8 = jnp.asarray(img)
    base_fn = el.make_pretrained_upscaler(IN_H, IN_W, OUT_H, OUT_W)
    ref_out = np.asarray(base_fn(x_u8))

    params, _ = load_checkpoint(1, "tpu4")
    p = params["params"] if "params" in params else params
    head_k64 = el._expand_in_rgba(np.asarray(p["head"]["kernel"], np.float32), ST, 1 / 255.0)
    head_k128 = np.concatenate(
        [head_k64, np.zeros((3, 3, 64, head_k64.shape[-1]), np.float32)], axis=2
    )
    head_b = jnp.asarray(np.asarray(p["head"]["bias"], np.float32))
    tk, tb = el._expand_out_rgba(
        np.asarray(p["tail"]["kernel"], np.float32),
        np.asarray(p["tail"]["bias"], np.float32), R, 255.0,
    )
    tail_k, tail_b = jnp.asarray(tk), jnp.asarray(tb)
    base_k64 = el._bilinear_base_kernel(4, UP, ST)
    base_k128 = np.concatenate(
        [base_k64, np.zeros((3, 3, 64, base_k64.shape[-1]), np.float32)], axis=2
    )
    bk = {n: jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), p[n]) for n in p}
    sels = el._row_phase_selectors(IN_H, ST)
    hk64, hk128 = jnp.asarray(head_k64), jnp.asarray(head_k128)
    bk64, bk128 = jnp.asarray(base_k64), jnp.asarray(base_k128)

    def graph(u8, pad128=True, basepad=False):
        x2d = u8.reshape(IN_H, IN_W * 4).astype(jnp.bfloat16)
        s2d = jnp.concatenate(
            [
                jnp.einsum("or,rw->ow", sels[q], x2d).reshape(NH, NW, ST * 4)[None]
                for q in range(ST)
            ],
            axis=-1,
        )
        if pad128 or basepad:
            s2d_w = jnp.concatenate(
                [s2d, jnp.zeros_like(s2d)], axis=-1
            )  # [1, nh, nw, 128]
        feat = (
            _conv(s2d_w, hk128, head_b) if pad128 else _conv(s2d, hk64, head_b)
        )
        h = feat
        for i in range(BLOCKS):
            blk = bk[f"block{i}"]
            t1 = jax.nn.relu(_conv(h, blk["conv1"]["kernel"], blk["conv1"]["bias"]))
            h = h + jnp.bfloat16(0.2) * _conv(t1, blk["conv2"]["kernel"], blk["conv2"]["bias"])
        h = _conv(h, bk["trunk"]["kernel"], bk["trunk"]["bias"]) + feat
        tail = _conv(h, tail_k, tail_b)
        if basepad:
            sp = jnp.pad(s2d_w, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            base = _conv(sp, bk128, pad="VALID")
        else:
            sp = jnp.pad(s2d, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            base = _conv(sp, bk64, pad="VALID")
        phases = tail + base
        ph_u8 = jnp.clip(jnp.round(phases[0].astype(jnp.float32)), 0, 255).astype(jnp.uint8)
        rows = [
            ph_u8[..., q * R * 4 : (q + 1) * R * 4].reshape(NH, OUT_W, 4)
            for q in range(R)
        ]
        return jnp.stack(rows, axis=1).reshape(OUT_H, OUT_W, 4)

    def chain(u8, out):
        v = jnp.sum(jnp.abs(out.reshape(-1).astype(jnp.float32) - 0.37)) % 2.0
        return jnp.clip(u8.astype(jnp.float32) + v, 0, 255).astype(jnp.uint8)

    for tag, kw in (
        ("v6 head64  base64 ", dict(pad128=False)),
        ("v6 head128 base64 ", {}),
        ("v6 head128 base128", dict(basepad=True)),
    ):
        f = jax.jit(functools.partial(graph, **kw))
        out = np.asarray(f(x_u8))
        err = out[..., :3].astype(np.float64) - ref_out[..., :3].astype(np.float64)
        psnr = 10 * np.log10(255.0**2 / max(float(np.mean(err**2)), 1e-12))
        t = device_timer(lambda s, f=f: chain(s, f(s)), x_u8, 15, ov)
        log(f"{tag}: {t*1000:7.3f} ms ({1.0/t:6.1f} fps)  parity {psnr:5.1f} dB")


if __name__ == "__main__":
    main()
