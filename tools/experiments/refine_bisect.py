"""Bisect the refinement serving graph's real (fully-materialized) cost.

Prior anatomy: refine+up(mid) = 7.63 ms with the v1 epilogue (f32 d2s +
raw-domain add), 10.85 ms with v2 (phase-domain add + u8 stack-d2s) — the
"2.4 ms standalone" reads are XLA DCE behind a tiny consumer. This probe
measures cumulative prefixes, each consumed by a full reduce, plus d2s
strategy variants:

  stack  — jnp.stack row-phase slices + reshape (relayout)
  matmul — transposed row-phase selector matmuls (d2s on the MXU, one u8
           convert of a fully-packed 2-D array; the s2d trick inverted)

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
    assert restored is not None
    params, _ = restored
    p = params["params"] if "params" in params else params
    dtype = jnp.bfloat16

    # rebuild the serving constants exactly as get_refine_graph does
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

    def trunk(s2d):
        hh = conv(s2d, head_k, head_b)
        t1 = jax.nn.relu(conv(hh, k1, b1))
        hh = hh + jnp.asarray(0.2, hh.dtype) * conv(t1, k2, b2)
        return hh

    def out_phase(a_u8, b_u8, mid_u8):
        hh = trunk(s2d_fn(a_u8, b_u8, mid_u8))
        tail = conv(hh, tail_k)[0]
        return jnp.clip(
            jnp.round(
                tail.astype(jnp.float32) + tail_b
                + mid_ph_fn(mid_u8).astype(jnp.float32)
            ),
            0, 255,
        )  # f32 [nh, nw, 64]

    def d2s_stack(out_ph_u8):
        rows = [
            out_ph_u8[..., q * st * 4 : (q + 1) * st * 4].reshape(nh, w, 4)
            for q in range(st)
        ]
        return jnp.stack(rows, axis=1).reshape(h, w, 4)

    def d2s_matmul(out_ph_f32):
        # row interleave as 4 transposed selector matmuls in bf16 (values
        # are integers ≤255 — bf16-exact); ONE u8 convert of a packed 2-D
        out2d = jnp.zeros((h, w * 4), dtype)
        for q in range(st):
            blk = out_ph_f32[..., q * st * 4 : (q + 1) * st * 4].reshape(nh, w * 4)
            out2d = out2d + jnp.einsum(
                "ro,ow->rw", selsT[q].astype(dtype), blk.astype(dtype)
            )
        return out2d.astype(jnp.uint8).reshape(h, w, 4)

    up = resample.make_resampler(h, w, 2160, 3840, "lanczos3")

    def carry(val, cur, acc):
        pert = jnp.max(val.reshape(-1)[:8]).astype(jnp.int32) % 2
        nxt = jnp.clip(cur.astype(jnp.int32) + pert, 0, 255).astype(jnp.uint8)
        return (cur, nxt, acc)

    state0 = (a0, b0, jnp.zeros((), jnp.float32))

    def t_of(make_val, label, iters=10):
        def body(state):
            prev, cur, acc = state
            v = make_val(prev, cur)
            acc = acc + jnp.sum(v.astype(jnp.float32))
            return carry(v, cur, acc)

        t = device_timer(body, state0, iters=iters) * 1e3
        log(f"{label:40s}: {t:7.3f} ms")
        return t

    # cumulative prefixes, fully reduced
    t_of(lambda a, b: s2d_fn(a, b, a), "s2d front end")
    t_of(lambda a, b: trunk(s2d_fn(a, b, a)), "+ head + block")
    t_of(lambda a, b: conv(trunk(s2d_fn(a, b, a)), tail_k)[0], "+ tail conv")
    t_of(lambda a, b: out_phase(a, b, a), "+ phase epilogue (f32)")
    t_of(lambda a, b: d2s_stack(out_phase(a, b, a).astype(jnp.uint8)),
         "+ d2s stack (u8)")
    t_of(lambda a, b: d2s_matmul(out_phase(a, b, a)), "+ d2s matmul")

    # the real consumer: the fused Pallas upscaler
    def t_up(make_mid, label, iters=10):
        def body(state):
            prev, cur, acc = state
            mid = make_mid(prev, cur)
            out_mid = up(mid)
            acc = acc + jnp.sum(out_mid[:1, :8, 0].astype(jnp.float32))
            return carry(mid, cur, acc)

        t = device_timer(body, state0, iters=iters) * 1e3
        log(f"{label:40s}: {t:7.3f} ms")
        return t

    t_up(lambda a, b: a, "up(const) baseline")
    t_up(lambda a, b: d2s_stack(out_phase(a, b, a).astype(jnp.uint8)),
         "refine(stack d2s) + up")
    t_up(lambda a, b: d2s_matmul(out_phase(a, b, a)), "refine(matmul d2s) + up")


if __name__ == "__main__":
    main()
