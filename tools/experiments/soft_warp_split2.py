"""Bench-context soft-warp stage split (r3): every earlier soft-warp number
was measured with frame_b (and often the flow) as a CLOSURE CONSTANT, letting
XLA hoist that frame's pyramid/slab work out of the timing loop. Here every
stage keeps BOTH frames and the flow live across iterations, matching how
bench.py's flow_soft pipeline actually runs.

Measured 2026-08-17 (first half, before the consume-shape fix):
    flow + soft warp (live pair)   :   4.675 ms
    flow + hard warp (live pair)   :   2.215 ms
    flow alone (live pair)         :   1.394 ms
    strip soft warp k=8 (cheap flow):  3.376 ms
    strip soft warp k=4 (cheap flow):  2.443 ms
    strip soft warp k=2 (cheap flow):  2.103 ms
→ soft warp alone ≈ 3.3 ms/pair, ~0.21 ms per candidate slab pair +
  ~1.7 ms fixed. This run adds k/rng ladders + component probes.

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
    from nu_scaler_tpu.kernels import soft_warp_pallas as SW
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.utils.tracing import device_timer

    h, w = 1080, 1920
    img = generate_test_pattern(w, h)
    a0 = jnp.asarray(img)
    b0 = jnp.asarray(np.roll(img, 16, axis=1))
    log(f"device {jax.devices()[0]}")

    def live_pair_body(stage_fn):
        """state=(a, b): apply stage to the live pair, derive the next pair
        from the output so nothing hoists."""

        def body(state):
            fa, fb = state
            out = stage_fn(fa, fb)
            pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.int32)
            return fb, jnp.clip(fb.astype(jnp.int32) + pert % 2, 0, 255).astype(jnp.uint8)

        return body

    def t_ms(stage_fn, iters=10):
        return device_timer(live_pair_body(stage_fn), (a0, b0), iters=iters) * 1e3

    flow_full = lambda fa, fb: I.compute_flow_fast(fa, fb)

    # end-to-end k/rng ladder with REAL flow
    for kk, rng_l in ((8, 48), (6, 48), (4, 48), (4, 24)):
        fn = SW._build(h, w, 8, 128, rng_l, kk, strip=True)
        t = t_ms(lambda fa, fb, fn=fn: fn(fa, fb, flow_full(fa, fb), 0.5))
        log(f"flow + soft warp k={kk} rng={rng_l} (live): {t:7.3f} ms")

    # warp with a CHEAP live flow (constant field perturbed by the frame, so
    # candidates/slabs stay input-dependent but flow cost ~vanishes)
    flow_c = jnp.broadcast_to(
        jnp.asarray([15.6, 0.37], jnp.float32), (h, w, 2)
    )

    def cheap_flow(fa):
        eps = (fa[0, 0, 0].astype(jnp.float32) % 2.0) * 1e-3
        return flow_c + eps

    for kk, rng_l in ((8, 48), (8, 24), (4, 48), (4, 24)):
        fn = SW._build(h, w, 8, 128, rng_l, kk, strip=True)
        t = t_ms(lambda fa, fb, fn=fn: fn(fa, fb, cheap_flow(fa), 0.5))
        log(f"strip soft warp k={kk} rng={rng_l} (cheap flow): {t:7.3f} ms")

    # extraction alone, both frames, exactly the _build frame_inputs math
    th, tw, rng_, k = 8, 128, 48, 8
    ty, tx = h // th, w // tw
    cy, cx = ty + 1, tx + 1
    hh, hw = th // 2, tw // 2
    pad_y, pad_x = rng_ + hh + 2, rng_ + hw + 2
    rs = cy * th + 16
    cs = (cx * tw + 32) * SW.LANES

    def extract(frame, sign, fa):
        tiles = jnp.clip(SW._tile_mean(sign * cheap_flow(fa), th, tw), -rng_, rng_)
        cand_y, cand_x, assign = SW._candidates(tiles, k, rng_)
        padded = jnp.pad(
            frame,
            ((pad_y, pad_y + th + 16), (pad_x, pad_x + tw + 32), (0, 0)),
            mode="edge",
        ).reshape(h + 2 * pad_y + th + 16, -1)
        slabs = [
            jax.lax.dynamic_slice(
                padded,
                (pad_y - hh + cand_y[i], (pad_x - hw + cand_x[i]) * SW.LANES),
                (rs, cs),
            )
            for i in range(k)
        ]
        return jnp.stack(slabs)

    def ext_both(fa, fb):
        st = jnp.concatenate([extract(fa, -0.5, fa), extract(fb, 0.5, fa)], axis=0)
        return st[:, :8, :128].max(axis=0)  # consume

    t = t_ms(ext_both)
    log(f"stack extraction both frames   : {t:7.3f} ms")

    # candidates alone (hist_topk ×2 + assignment)
    def cand_both(fa, fb):
        tiles = jnp.clip(SW._tile_mean(cheap_flow(fa), th, tw), -rng_, rng_)
        ca = SW._candidates(tiles, k, rng_)
        cb = SW._candidates(jnp.clip(-tiles, -rng_, rng_), k, rng_)
        s = ca[0].sum() + ca[1].sum() + cb[0].sum() + cb[1].sum() + fb[0, 0, 0]
        return jnp.broadcast_to(s.astype(jnp.uint8), (8, 128))

    t = t_ms(cand_both)
    log(f"candidate selection ×2         : {t:7.3f} ms")

    # pad alone
    def pad_both(fa, fb):
        pa = jnp.pad(fa, ((pad_y, pad_y + th + 16), (pad_x, pad_x + tw + 32), (0, 0)), mode="edge")
        pb = jnp.pad(fb, ((pad_y, pad_y + th + 16), (pad_x, pad_x + tw + 32), (0, 0)), mode="edge")
        return (pa[:h, :w] // 2 + pb[:h, :w] // 2)

    t = t_ms(pad_both)
    log(f"edge pads both frames          : {t:7.3f} ms")

    # kernel alone: stack lives in loop state, scalars fixed host-side
    tiles_np = np.clip(
        np.asarray(SW._tile_mean(flow_c, th, tw)), -rng_, rng_
    )
    cand_y, cand_x, assign = (
        np.asarray(x) for x in SW._candidates(jnp.asarray(tiles_np), k, rng_)
    )
    idx = jnp.asarray(assign.reshape(-1))
    sy = jnp.asarray(tiles_np[..., 1].astype(np.float32).reshape(-1))
    sx = jnp.asarray(tiles_np[..., 0].astype(np.float32).reshape(-1))
    cy_j, cx_j = jnp.asarray(cand_y), jnp.asarray(cand_x)
    t_arr = jnp.asarray([0.5], jnp.float32)
    rowpair = np.concatenate([assign[:1], assign, assign[-1:]], axis=0)
    onehot = (rowpair[..., None] == np.arange(k)).astype(np.int32)
    row_hit = jnp.asarray(onehot[:-1].sum(axis=1) + onehot[1:].sum(axis=1))
    act = jnp.concatenate([row_hit, row_hit], axis=1).reshape(-1)

    import functools

    grid_spec = None  # use the cached _build call object via a tiny shim
    fnb = SW._build(h, w, th, tw, rng_, k, strip=True)
    # reach the pallas call through a fresh build of the same params
    # (the call object is local; invoke the kernel by replaying fn with a
    # pre-padded trick instead: state = stack, scalars fixed)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    call = pl.pallas_call(
        functools.partial(SW._kernel_strip, th=th, tw=tw, k=k, ty=ty, tx=tx),
        out_shape=jax.ShapeDtypeStruct((cy * th, cx * tw * SW.LANES), jnp.uint8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=12,
            grid=(cy,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (th, cx * tw * SW.LANES), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 2 * k, th + 8, cs), jnp.uint8),
                pltpu.VMEM((th, cx * tw * SW.LANES), jnp.float32),
                pltpu.VMEM((th, cx * tw * SW.LANES), jnp.float32),
                pltpu.VMEM((th, cx * tw * SW.LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
    )

    def kernel_body(state):
        stack = state
        out = call(idx, sy, sx, cy_j, cx_j, idx, sy, sx, cy_j, cx_j,
                   t_arr, act, stack)
        pert = jnp.max(out.reshape(-1)[:8]).astype(jnp.int32) % 2
        return jnp.clip(stack.astype(jnp.int32) + pert, 0, 255).astype(jnp.uint8)

    stack0 = jnp.zeros((2 * k, rs, cs), jnp.uint8)
    t = device_timer(kernel_body, stack0, iters=10) * 1e3
    log(f"kernel alone (fixed scalars)   : {t:7.3f} ms")


if __name__ == "__main__":
    main()
