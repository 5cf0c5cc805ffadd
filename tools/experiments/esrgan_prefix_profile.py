"""Prefix-ladder decomposition of the fused tpu4 serving graph: time
cumulative prefixes (s2d → head → blocks → trunk → tail → base → quantize →
d2s) under one identical feedback chain, so stage costs = successive deltas.
Run on the TPU, background, uninterrupted."""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


IN_H, IN_W, OUT_H, OUT_W = 1080, 1920, 2160, 3840
ARCH = os.environ.get("ESRGAN_ARCH", "tpu4")  # tpu4 | tpu4b2
ST, BLOCKS, UP = 4, (2 if ARCH == "tpu4b2" else 3), 2
R = ST * UP


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
    nh, nw = IN_H // ST, IN_W // ST

    params, _ = load_checkpoint(1, ARCH)
    p = params["params"] if "params" in params else params
    head_k = jnp.asarray(expand_in_rgba(np.asarray(p["head"]["kernel"], np.float32), ST, 1 / 255.0))
    head_b = jnp.asarray(np.asarray(p["head"]["bias"], np.float32))
    tk, tb = expand_out_rgba(
        np.asarray(p["tail"]["kernel"], np.float32),
        np.asarray(p["tail"]["bias"], np.float32), R, 255.0,
    )
    tail_k, tail_b = jnp.asarray(tk), jnp.asarray(tb)
    base_k = jnp.asarray(el._bilinear_base_kernel(4, UP, ST))
    bk = {n: jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), p[n]) for n in p}

    def s2d(u8):
        xr = u8.reshape(nh, ST, IN_W * 4)
        parts = [xr[:, q, :].reshape(nh, nw, ST * 4) for q in range(ST)]
        return jnp.concatenate(parts, axis=-1)[None]

    def stage(u8, upto):
        if upto == 0:
            return u8[:1, :1, :1].astype(jnp.float32)  # chain-only floor
        s = s2d(u8)
        x = s.astype(jnp.bfloat16)
        if upto == 1:
            return x
        feat = _conv(x, head_k, head_b)
        if upto == 2:
            return feat
        h = feat
        for i in range(BLOCKS):
            blk = bk[f"block{i}"]
            t1 = jax.nn.relu(_conv(h, blk["conv1"]["kernel"], blk["conv1"]["bias"]))
            h = h + jnp.bfloat16(0.2) * _conv(t1, blk["conv2"]["kernel"], blk["conv2"]["bias"])
            if upto == 3 + i:
                return h
        h = _conv(h, bk["trunk"]["kernel"], bk["trunk"]["bias"]) + feat
        if upto == 3 + BLOCKS:
            return h
        tail = _conv(h, tail_k, tail_b)
        if upto == 4 + BLOCKS:
            return tail
        xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        phases = tail + _conv(xpad, base_k, pad="VALID")
        if upto == 5 + BLOCKS:
            return phases
        ph_u8 = jnp.clip(jnp.round(phases[0].astype(jnp.float32)), 0, 255).astype(jnp.uint8)
        if upto == 6 + BLOCKS:
            return ph_u8
        rows = [
            ph_u8[..., q * R * 4 : (q + 1) * R * 4].reshape(nh, OUT_W, 4)
            for q in range(R)
        ]
        return jnp.stack(rows, axis=1).reshape(OUT_H, OUT_W, 4)

    names = (
        ["chain floor", "s2d+bf16", "head"]
        + [f"block{i}" for i in range(BLOCKS)]
        + ["trunk+skip", "tail", "base+add", "quantize", "d2s (full)"]
    )
    prev = 0.0
    for upto, name in enumerate(names):
        fn = jax.jit(lambda u8, u=upto: stage(u8, u))

        def body(s, fn=fn):
            out = fn(s)
            # full-reduction consumer: forces materialization (a one-element
            # read lets XLA DCE the stage — see esrgan_surgery3 lesson)
            v = jnp.sum(jnp.abs(out.reshape(-1).astype(jnp.float32) - 0.37)) % 2.0  # nonlinear: can't fold through convs
            return jnp.clip(s.astype(jnp.float32) + v, 0, 255).astype(jnp.uint8)

        t = device_timer(body, x_u8, 10, ov) * 1000.0
        log(f"{upto:2d} {name:12s}: {t:7.3f} ms  (Δ {t - prev:+6.3f})")
        prev = t


if __name__ == "__main__":
    main()
