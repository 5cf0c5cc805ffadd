"""Refinement → Pallas-upscaler boundary, part 2. Prior: net fully-reduced
2.4 ms; refine(matmul-d2s)+up = 6.36 ms vs up(const) 1.14 — ~2.7 ms of
boundary cost left. Variants here separate: a general XLA-produced-input
tax on the pallas_call, the 4-einsum accumulate chain vs one permutation
matmul, and the u8-cast placement.

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
    from nu_scaler_tpu.ops import interpolate as I
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
    tb = np.asarray(p["tail"]["bias"], np.float32)
    tk4 = np.zeros(tk.shape[:3] + (st * st * 4,), np.float32)
    tb4 = np.zeros((st * st * 4,), np.float32)
    for q in range(st * st):
        tk4[..., q * 4 : q * 4 + 3] = tk[..., q * 3 : q * 3 + 3]
        tb4[q * 4 : q * 4 + 3] = tb[q * 3 : q * 3 + 3] * 255.0
    tail_k = jnp.asarray(tk4)
    tail_b = jnp.asarray(tb4)
    sels = el._row_phase_selectors(h, st)
    selsT = [jnp.asarray(np.asarray(s).T) for s in sels]
    # one permutation matrix: maps phase-major stacked rows → natural rows
    perm = np.zeros((h, h), np.float32)
    for q in range(st):
        perm[:, q * nh : (q + 1) * nh] = np.asarray(sels[q]).T
    perm_j = jnp.asarray(perm.astype(np.float32))

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
        )

    def d2s_4mm(out_ph):
        out2d = jnp.zeros((h, w * 4), dtype)
        for q in range(st):
            blk = out_ph[..., q * st * 4 : (q + 1) * st * 4].reshape(nh, w * 4)
            out2d = out2d + jnp.einsum(
                "ro,ow->rw", selsT[q].astype(dtype), blk.astype(dtype)
            )
        return out2d.astype(jnp.uint8).reshape(h, w, 4)

    def d2s_1mm(out_ph):
        stacked = jnp.concatenate(
            [
                out_ph[..., q * st * 4 : (q + 1) * st * 4].reshape(nh, w * 4)
                for q in range(st)
            ],
            axis=0,
        ).astype(dtype)  # [h, w·4] phase-major rows
        out2d = jnp.einsum("ro,ow->rw", perm_j.astype(dtype), stacked)
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

    # controls: how much does ANY XLA-produced input cost the pallas up()?
    t_up(lambda a, b: a, "up(const)")
    t_up(lambda a, b: jnp.clip(a.astype(jnp.int32) + 1, 0, 255).astype(jnp.uint8),
         "up(a+1 elementwise)")
    t_up(lambda a, b: I.blend_only(a, b, 0.5), "up(blend_only)")

    # d2s variants under the full net
    t_up(lambda a, b: d2s_4mm(out_phase(a, b, a)), "refine + d2s 4-matmul")
    t_up(lambda a, b: d2s_1mm(out_phase(a, b, a)), "refine + d2s 1-matmul(perm)")

    # isolate d2s itself: phase tensor from cheap elementwise, not the net
    def fake_phase(a_u8):
        x = mid_ph_fn(a_u8)  # [nh, nw, 64] bf16 raw
        return jnp.clip(jnp.round(x.astype(jnp.float32)), 0, 255)

    t_up(lambda a, b: d2s_4mm(fake_phase(a)), "mid_ph + d2s 4-matmul (no net)")
    t_up(lambda a, b: d2s_1mm(fake_phase(a)), "mid_ph + d2s 1-matmul (no net)")


if __name__ == "__main__":
    main()
