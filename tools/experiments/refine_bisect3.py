"""Refinement d2s relayout, part 3. Prior: refine+d2s+up = 6.2 ms vs net
2.4 (fully reduced) + d2s/up 1.45 — ~2.4 ms lost materializing the NHWC
conv output into 2-D phase rows (4× slice [270,480,16-of-64] f32 →
reshape [270,7680]). Variants move the precision cast BEFORE the reshape
(bf16 = ½ traffic, u8 = ¼) and isolate the relayout with a barrier.

Run on the TPU, background, uninterrupted."""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def main() -> None:
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.models import interp_refine as ir
    from nu_scaler_tpu.models import esrgan_lite as el
    from nu_scaler_tpu.ops import resample
    from nu_scaler_tpu.utils.tracing import device_timer

    h, w = 1080, 1920
    st = 4
    nh, nw = h // st, w // st
    img = generate_test_pattern(w, h)
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    log(f"device {jax.devices()[0]}")

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
    selsT = [jnp.asarray(np.asarray(s).T) for s in sels]

    def conv(x, k, b=None):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y if b is None else y + b.astype(x.dtype)

    def s2d_fn(a_u8, b_u8, mid_u8):
        x = jnp.concatenate([a_u8, b_u8, mid_u8], axis=-1)
        x2d = x.reshape(h, w * 12).astype(dtype)
        return jnp.concatenate(
            [
                jnp.einsum("or,rw->ow", sels[q].astype(dtype), x2d)
                .reshape(nh, nw, st * 12)[None]
                for q in range(st)
            ],
            axis=-1,
        )

    def mid_ph_fn(mid_u8):
        mid2d = mid_u8.reshape(h, w * 4).astype(dtype)
        return jnp.concatenate(
            [
                jnp.einsum("or,rw->ow", sels[q].astype(dtype), mid2d)
                .reshape(nh, nw, st * 4)
                for q in range(st)
            ],
            axis=-1,
        )

    def out_phase(a_u8, b_u8, mid_u8):
        hh = conv(s2d_fn(a_u8, b_u8, mid_u8), head_k, head_b)
        t1 = jax.nn.relu(conv(hh, k1, b1))
        hh = hh + jnp.asarray(0.2, hh.dtype) * conv(t1, k2, b2)
        tail = conv(hh, tail_k)[0]
        return jnp.clip(
            jnp.round(
                tail.astype(jnp.float32) + tail_b
                + mid_ph_fn(mid_u8).astype(jnp.float32)
            ),
            0, 255,
        )  # f32 [nh, nw, 64], integer-valued

    def d2s(out_ph, blk_dtype):
        # cast in NHWC (fuses into the epilogue), slice+reshape at the
        # narrow dtype, einsum in bf16 (u8 operands upcast in the read)
        cast = out_ph.astype(blk_dtype)
        out2d = jnp.zeros((h, w * 4), dtype)
        for q in range(st):
            blk = cast[..., q * st * 4 : (q + 1) * st * 4].reshape(nh, w * 4)
            out2d = out2d + jnp.einsum(
                "ro,ow->rw", selsT[q].astype(dtype), blk.astype(dtype)
            )
        return out2d.astype(jnp.uint8).reshape(h, w, 4)

    up = resample.make_resampler(h, w, 2160, 3840, "lanczos3")
    state0 = (a0, b0, jnp.zeros((), jnp.float32))

    def t_up(make_mid, label, iters=10):
        def body(state):
            prev, cur, acc = state
            mid = make_mid(prev, cur)
            out_mid = up(mid)
            acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
            pert = jnp.max(mid.reshape(-1)[:8]).astype(jnp.int32) % 2
            nxt = jnp.clip(cur.astype(jnp.int32) + pert, 0, 255).astype(jnp.uint8)
            return (cur, nxt, acc)

        t = device_timer(body, state0, iters=iters) * 1e3
        log(f"{label:44s}: {t:7.3f} ms")
        return t

    t_up(lambda a, b: d2s(out_phase(a, b, a), jnp.float32), "d2s blocks in f32 (prior 6.21)")
    t_up(lambda a, b: d2s(out_phase(a, b, a), dtype), "d2s blocks in bf16")
    t_up(lambda a, b: d2s(out_phase(a, b, a), jnp.uint8), "d2s blocks in u8")

    # isolate: net → barrier (forces NHWC materialization) → tiny consumer
    def barrier_only(a, b):
        ph = jax.lax.optimization_barrier(out_phase(a, b, a))
        return jnp.clip(ph[:1, :8, 0], 0, 255).astype(jnp.uint8)

    def body_b(state):
        prev, cur, acc = state
        v = barrier_only(prev, cur)
        acc = acc + jnp.sum(v.astype(jnp.float32))
        pert = jnp.max(v.astype(jnp.int32)) % 2
        nxt = jnp.clip(cur.astype(jnp.int32) + pert, 0, 255).astype(jnp.uint8)
        return (cur, nxt, acc)

    t = device_timer(body_b, state0, iters=10) * 1e3
    log(f"{'net NHWC materialized (barrier, no d2s)':44s}: {t:7.3f} ms")

    # barrier then full d2s+up: is the slice-reshape chain itself the cost,
    # or a layout choice XLA propagates INTO the conv chain?
    t_up(lambda a, b: d2s(jax.lax.optimization_barrier(out_phase(a, b, a)), dtype),
         "barrier + d2s bf16 + up")


if __name__ == "__main__":
    main()
