"""TPU: s2d ladder for the learned tier's front end. The r3 prefix profile
(esrgan_prefix_profile.py, tpu4b2) reads s2d+bf16 at 2.41 ms — the single
biggest stage — despite the one-hot select-matmul design measuring 0.05 ms
in isolation (esrgan_surgery3.py). Hypothesis: the cost is NOT the row
selection but the [270,7680]→[270,480,16] lane-split reshapes + 16-lane
concat feeding the conv. Variants:

  a) production: 4 select-matmuls → reshape(480,16) → lane concat → pad 128
  b) u8 contiguous merge [1080,7680]→[270,30720] → cast → 4 static lane
     slices → reshape → concat (row selection becomes a free u8 reshape)
  c) like (b) but slicing the u8 array and casting the slices
  d) sublane-split [1080,7680]→[270,4,7680], static middle-index slices
  e) per-phase 16-ch convs summed (no lane concat at all; conv is linear in
     in-channels, so head = Σ_q conv(phase_q, head_k[16q:16q+16]))

All feed the SAME expanded 128-in head conv (zero-padded rows) and are
validated against (a). Run on the TPU, background, uninterrupted."""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


IN_H, IN_W, ST = 1080, 1920, 4
NH, NW = IN_H // ST, IN_W // ST
CH = ST * ST * 4  # 64 s2d channels


def main() -> None:
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.models.esrgan_lite import _row_phase_selectors
    from nu_scaler_tpu.utils.tracing import device_timer

    log(f"device {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    img = jnp.asarray(generate_test_pattern(IN_W, IN_H))
    head_k = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.bfloat16)
    head_k = head_k.at[:, :, CH:, :].set(0.0)
    head_b = jnp.asarray(rng.standard_normal(128) * 0.01, jnp.bfloat16)
    sels = _row_phase_selectors(IN_H, ST)
    dtype = jnp.bfloat16

    def conv(x, k, b):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(x.dtype)

    def head(s2d64):  # [1, NH, NW, 64] → conv at 128 lanes
        s = jnp.concatenate([s2d64, jnp.zeros_like(s2d64)], axis=-1)
        return conv(s, head_k, head_b)

    def v_a(img_u8):
        x2d = img_u8.reshape(IN_H, IN_W * 4).astype(dtype)
        s2d = jnp.concatenate(
            [
                jnp.einsum("or,rw->ow", sels[q].astype(dtype), x2d)
                .reshape(NH, NW, ST * 4)[None]
                for q in range(ST)
            ],
            axis=-1,
        )
        return head(s2d)

    def v_b(img_u8):
        merged = img_u8.reshape(IN_H, IN_W * 4).reshape(NH, ST * IN_W * 4)
        m = merged.astype(dtype)
        s2d = jnp.concatenate(
            [
                m[:, q * IN_W * 4 : (q + 1) * IN_W * 4]
                .reshape(NH, NW, ST * 4)[None]
                for q in range(ST)
            ],
            axis=-1,
        )
        return head(s2d)

    def v_c(img_u8):
        merged = img_u8.reshape(IN_H, IN_W * 4).reshape(NH, ST * IN_W * 4)
        s2d = jnp.concatenate(
            [
                merged[:, q * IN_W * 4 : (q + 1) * IN_W * 4]
                .astype(dtype)
                .reshape(NH, NW, ST * 4)[None]
                for q in range(ST)
            ],
            axis=-1,
        )
        return head(s2d)

    def v_d(img_u8):
        x3 = img_u8.reshape(IN_H, IN_W * 4).reshape(NH, ST, IN_W * 4)
        s2d = jnp.concatenate(
            [
                x3[:, q, :].astype(dtype).reshape(NH, NW, ST * 4)[None]
                for q in range(ST)
            ],
            axis=-1,
        )
        return head(s2d)

    def v_e(img_u8):
        merged = img_u8.reshape(IN_H, IN_W * 4).reshape(NH, ST * IN_W * 4)
        m = merged.astype(dtype)
        acc = None
        for q in range(ST):
            ph = m[:, q * IN_W * 4 : (q + 1) * IN_W * 4].reshape(NH, NW, ST * 4)[None]
            kq = head_k[:, :, q * ST * 4 : (q + 1) * ST * 4, :]
            y = jax.lax.conv_general_dilated(
                ph, kq, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            acc = y if acc is None else acc + y
        return acc + head_b.astype(acc.dtype)

    variants = [("a sel-matmul (prod)", v_a), ("b u8-merge cast-first", v_b),
                ("c u8-merge slice-first", v_c), ("d sublane-split", v_d),
                ("e per-phase conv sum", v_e)]

    ref = None
    for name, fn in variants:
        jf = jax.jit(fn)
        out = np.asarray(jf(img), np.float32)
        if ref is None:
            ref = out
        err = np.abs(out - ref).max()

        def body(state, jf=jf):
            x, acc = state
            o = jf(x)
            acc = acc + jnp.sum(o[0, :1, :8, 0].astype(jnp.float32))
            nx = jnp.clip(
                x.astype(jnp.int32) + (acc.astype(jnp.int32) % 2), 0, 255
            ).astype(jnp.uint8)
            return nx, acc

        t = device_timer(body, (img, jnp.zeros((), jnp.float32)), iters=10) * 1e3
        log(f"{name:26s}: {t:7.3f} ms  maxdiff {err:.4f}")


if __name__ == "__main__":
    main()
