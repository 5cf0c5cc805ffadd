"""Refinement d2s relayout, part 4. Prior (bisect3): net fully reduced
2.33 ms; ANY d2s form fed by the real conv output lands 6.2-6.7 ms —
even behind an optimization_barrier — vs 1.45 ms for d2s+up on a cheap
control input. The cost is the 16-lane slice+reshape of the materialized
[nh, nw, 64] NHWC tensor (u8 tiles are (32,128): 16-lane granules
misalign; the SR tier's 0.54 ms d2s slices 32-lane granules).

Variants here avoid the 16-lane slice+reshape entirely:
  A. per-q 3-D einsum  "rn,nwl->rwl" on ph4[:, :, q] slices, accumulated
     (slice feeds a dot operand, not a reshape)
  B. ONE dot_general multi-contracting (nh, q): S3 [h, nh, 4] × ph4
     [nh, nw, 4, 16] → [h, nw, 16] → reshape (h, w4)
  C. split tail conv into 4 per-row-phase convs [3,3,128,16] and
     stack-d2s their (nh, w4) reshapes (XLA picks each 16-lane layout)
  D. split tail convs + per-q row-selector matmul accumulate

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
    # S3[r, n, q] = 1 iff r = 4n + q  (row de-interleave as one contraction)
    s3_np = np.zeros((h, nh, st), np.float32)
    for r in range(h):
        s3_np[r, r // st, r % st] = 1.0
    S3 = jnp.asarray(s3_np, dtype)

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

    def trunk(a_u8, b_u8, mid_u8):
        hh = conv(s2d_fn(a_u8, b_u8, mid_u8), head_k, head_b)
        t1 = jax.nn.relu(conv(hh, k1, b1))
        return hh + jnp.asarray(0.2, hh.dtype) * conv(t1, k2, b2)

    def out_phase(a_u8, b_u8, mid_u8):
        tail = conv(trunk(a_u8, b_u8, mid_u8), tail_k)[0]
        return jnp.clip(
            jnp.round(
                tail.astype(jnp.float32) + tail_b
                + mid_ph_fn(mid_u8).astype(jnp.float32)
            ),
            0, 255,
        )  # f32 [nh, nw, 64], integer-valued

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
        log(f"{label:46s}: {t:7.3f} ms")
        return t

    # A: per-q 3-D einsum, accumulate [h, nw, 16] then one reshape
    def mid_A(a, b):
        ph4 = out_phase(a, b, a).astype(dtype).reshape(nh, nw, st, st * 4)
        out = jnp.zeros((h, nw, st * 4), dtype)
        for q in range(st):
            out = out + jnp.einsum(
                "rn,nwl->rwl", selsT[q].astype(dtype), ph4[:, :, q]
            )
        return out.reshape(h, w, 4).astype(jnp.uint8)

    # B: one dot_general contracting (nh, q) jointly
    def mid_B(a, b):
        ph4 = out_phase(a, b, a).astype(dtype).reshape(nh, nw, st, st * 4)
        out = jax.lax.dot_general(
            S3, ph4, (((1, 2), (0, 2)), ((), ())),
            preferred_element_type=dtype,
        )  # [h, nw, st*4]
        return out.reshape(h, w, 4).astype(jnp.uint8)

    t_up(mid_A, "A per-q 3-D einsum d2s")
    t_up(mid_B, "B one multi-contract dot_general d2s")

    # C/D: split tail conv per row phase
    tails_q = [jnp.asarray(tk4[..., q * 16 : (q + 1) * 16]) for q in range(st)]
    tbs_q = [jnp.asarray(tb4[q * 16 : (q + 1) * 16]) for q in range(st)]

    def mid_C(a, b):
        hh = trunk(a, b, a)
        midp = mid_ph_fn(a).astype(jnp.float32)
        rows = []
        for q in range(st):
            t = conv(hh, tails_q[q])[0]
            o = jnp.clip(
                jnp.round(
                    t.astype(jnp.float32) + tbs_q[q]
                    + midp[..., q * 16 : (q + 1) * 16]
                ),
                0, 255,
            ).astype(jnp.uint8)
            rows.append(o.reshape(nh, w, 4))
        return jnp.stack(rows, axis=1).reshape(h, w, 4)

    def mid_D(a, b):
        hh = trunk(a, b, a)
        midp = mid_ph_fn(a).astype(jnp.float32)
        out = jnp.zeros((h, w * 4), dtype)
        for q in range(st):
            t = conv(hh, tails_q[q])[0]
            o = jnp.clip(
                jnp.round(
                    t.astype(jnp.float32) + tbs_q[q]
                    + midp[..., q * 16 : (q + 1) * 16]
                ),
                0, 255,
            ).astype(dtype)
            out = out + jnp.einsum(
                "rn,nl->rl", selsT[q].astype(dtype), o.reshape(nh, w * 4)
            )
        return out.astype(jnp.uint8).reshape(h, w, 4)

    t_up(mid_C, "C split tail convs + stack d2s")
    t_up(mid_D, "D split tail convs + row-matmul d2s")

    # control: committed u8-stack form (expected ~6.2)
    def mid_ctrl(a, b):
        out_ph = out_phase(a, b, a).astype(jnp.uint8)
        rows = [
            out_ph[..., q * st * 4 : (q + 1) * st * 4].reshape(nh, w, 4)
            for q in range(st)
        ]
        return jnp.stack(rows, axis=1).reshape(h, w, 4)

    t_up(mid_ctrl, "control committed u8-stack d2s")

    # parity check (A/B/C/D vs control) on one call
    ref = np.asarray(jax.jit(mid_ctrl)(a0, b0))
    for name, fn in (("A", mid_A), ("B", mid_B), ("C", mid_C), ("D", mid_D)):
        got = np.asarray(jax.jit(fn)(a0, b0))
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        log(f"parity {name}: max|Δ|={diff.max()}  mean={diff.mean():.5f}")


if __name__ == "__main__":
    main()
