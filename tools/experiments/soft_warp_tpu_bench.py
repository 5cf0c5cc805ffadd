"""TPU measurement of the Pallas cell-grid soft warp vs the XLA soft path
(kernels/soft_warp_pallas.py; VERDICT r3 item 2 — flow_soft ≥ 450 out-fps
needs the warp stage at ~1 ms). Also checks the kernel against its numpy
golden ON THE TPU (Mosaic lowering differences would show here).

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
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    h, w = 1080, 1920
    img = generate_test_pattern(w, h)
    a = jnp.asarray(img)
    b = jnp.asarray(np.roll(img, 5, axis=1))

    # correctness on TPU vs numpy golden (small but Mosaic-compiled shape)
    hs, ws = 64, 256
    a_s = np.asarray(img[:hs, :ws])
    b_s = np.asarray(np.roll(img, 3, axis=1)[:hs, :ws])
    fl = np.zeros((hs, ws, 2), np.float32)
    fl[..., 0] = np.linspace(-4, 4, ws)[None, :] + 0.13
    fl[..., 1] = 1.37
    out_t = np.asarray(
        SW.soft_warp_blend(
            jnp.asarray(a_s), jnp.asarray(b_s), jnp.asarray(fl), 0.4,
            tile=(8, 128), rng=16,
        )
    )
    ref = SW.soft_warp_blend_ref(a_s, b_s, fl, 0.4, tile=(8, 128), rng=16)
    d = np.abs(out_t.astype(int) - ref.astype(int))
    log(f"TPU kernel vs golden (64x256): max {d.max()}, mean {d.mean():.4f}")

    # flow for the big timing
    flow = I.compute_flow_fast(a, b)
    flow.block_until_ready()

    def chain(u8, out):
        return jnp.clip(
            u8.astype(jnp.int32) + out[0, 0, 0].astype(jnp.int32) % 2, 0, 255
        ).astype(jnp.uint8)

    # Pallas soft warp alone (flow fixed): strip-grid (v3) vs cell-grid (v2)
    strip_fn = SW._build(h, w, 8, 128, 48, 8, strip=True)
    cell_fn = SW._build(h, w, 8, 128, 48, 8, strip=False)
    pall = jax.jit(lambda fa: strip_fn(fa, b, flow, 0.5))
    t = device_timer(lambda s: chain(s, pall(s)), a, 10, ov)
    log(f"pallas strip soft warp : {t*1000:7.3f} ms")
    pall_cell = jax.jit(lambda fa: cell_fn(fa, b, flow, 0.5))
    t = device_timer(lambda s: chain(s, pall_cell(s)), a, 10, ov)
    log(f"pallas cell soft warp  : {t*1000:7.3f} ms")
    d = np.abs(
        np.asarray(pall(a)).astype(int) - np.asarray(pall_cell(a)).astype(int)
    )
    log(f"strip vs cell: max {d.max()}, mean {d.mean():.4f}")

    xla = jax.jit(
        lambda fa: I.warp_blend_fast(fa, b, flow, 0.5, overlap=True, pallas_ok=False)
    )
    t = device_timer(lambda s: chain(s, xla(s)), a, 5, ov)
    log(f"XLA soft warp alone    : {t*1000:7.3f} ms")

    hard = jax.jit(lambda fa: I.warp_blend_fast(fa, b, flow, 0.5, overlap=False))
    t = device_timer(lambda s: chain(s, hard(s)), a, 10, ov)
    log(f"hard block warp alone  : {t*1000:7.3f} ms")

    # full flow_soft pipeline step (flow + warp), as the bench pipeline runs
    def step_soft(s):
        flw = I.compute_flow_fast(s, b)
        return chain(s, I.warp_blend_fast(s, b, flw, 0.5, overlap=True))

    t = device_timer(step_soft, a, 10, ov)
    log(f"flow_soft full step    : {t*1000:7.3f} ms → {2.0/t:6.1f} out-fps")

    # agreement with the XLA soft path at 1080p on the real flow
    o_p = np.asarray(pall(a))
    o_x = np.asarray(xla(a))
    d = np.abs(o_p[..., :3].astype(int) - o_x[..., :3].astype(int))
    log(f"pallas vs XLA soft @1080p: max {d.max()}, mean {d.mean():.3f}, "
        f">2: {(d > 2).mean()*100:.3f}%")


def split_profile() -> None:
    """Extraction vs kernel split: is the cost the 16 lane-misaligned
    dynamic_slices (XLA) or the Pallas grid itself?"""
    import os
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.kernels import soft_warp_pallas as SW
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    h, w = 1080, 1920
    img = generate_test_pattern(w, h)
    a = jnp.asarray(img)
    b = jnp.asarray(np.roll(img, 5, axis=1))
    flow = I.compute_flow_fast(a, b)
    flow.block_until_ready()

    th, tw, rng_, k = 8, 128, 48, 8
    ty, tx = h // th, w // tw
    cy, cx = ty + 1, tx + 1
    hh, hw = th // 2, tw // 2
    pad_y, pad_x = rng_ + hh + 2, rng_ + hw + 2
    rs = cy * th + 16
    cs = (cx * tw + 32) * SW.LANES

    def extraction_only(fa):
        t_arr = jnp.asarray([0.5], jnp.float32)
        outs = []
        for frame, sign in ((fa, -t_arr[0]), (b, 1.0 - t_arr[0])):
            tiles = jnp.clip(SW._tile_mean(sign * flow, th, tw), -rng_, rng_)
            cand_y, cand_x, assign = SW._candidates(tiles, k, rng_)
            padded = jnp.pad(
                frame,
                ((pad_y, pad_y + th + 16), (pad_x, pad_x + tw + 32), (0, 0)),
                mode="edge",
            ).reshape(h + 2 * pad_y + th + 16, -1)
            outs.append(
                jnp.stack([
                    jax.lax.dynamic_slice(
                        padded,
                        (pad_y - hh + cand_y[i], (pad_x - hw + cand_x[i]) * SW.LANES),
                        (rs, cs),
                    )
                    for i in range(k)
                ])
            )
        return jnp.concatenate(outs, axis=0)

    f = jax.jit(extraction_only)

    def chain(u8, out):
        v = jnp.sum(jnp.abs(out.reshape(-1).astype(jnp.float32) - 0.37)) % 2.0
        return jnp.clip(u8.astype(jnp.float32) + v, 0, 255).astype(jnp.uint8)

    t = device_timer(lambda s: chain(s, f(s)), a, 10, ov)
    log(f"slab extraction alone  : {t*1000:7.3f} ms (16 dynamic_slices + pads)")

    # row-aligned-only extraction (lane offset zeroed): how much is the
    # misaligned LANE offset?
    def extraction_row_only(fa):
        padded = jnp.pad(
            fa, ((pad_y, pad_y + th + 16), (pad_x, pad_x + tw + 32), (0, 0)),
            mode="edge",
        ).reshape(h + 2 * pad_y + th + 16, -1)
        tiles = jnp.clip(SW._tile_mean(-0.5 * flow, th, tw), -rng_, rng_)
        cand_y, cand_x, _ = SW._candidates(tiles, k, rng_)
        return jnp.stack([
            jax.lax.dynamic_slice(
                padded, (pad_y - hh + cand_y[i], 0), (rs, cs)
            )
            for i in range(2 * k)
        ] if False else [
            jax.lax.dynamic_slice(
                padded, (pad_y - hh + cand_y[i % k], 0), (rs, cs)
            )
            for i in range(2 * k)
        ])

    f2 = jax.jit(extraction_row_only)
    t = device_timer(lambda s: chain(s, f2(s)), a, 10, ov)
    log(f"row-only extraction    : {t*1000:7.3f} ms (lane offset = 0)")


if __name__ == "__main__":
    import os as _os

    if _os.environ.get("SW_SPLIT"):
        split_profile()
    else:
        main()
