"""Pallas TPU kernel: block-motion-compensated warp/blend.

Per-pixel backward warping needs a gather, and `tpu.dynamic_gather` is not
available on this v5e toolchain (neither sublane- nor lane-dim). The
TPU-native formulation is **block motion compensation** — the same model the
reference's legacy `BlockMatchingInterpolator` used
(`Nu_scale/src/upscale/fsr3.rs:250-292`, `interpolation/mod.rs` C11):

  * dense flow (from the Horn–Schunck pyramid) is averaged per output tile,
  * each tile warps by a uniform motion vector: integer part = one dynamic
    HBM→VMEM DMA at a computed offset, fractional part = a 2×2 static-shift
    bilinear lerp inside VMEM,
  * A- and B-slabs blend with mix(a, b, t) and round-pack to u8.

No gathers anywhere: per tile it is 2 small DMAs + VPU math. Tile size
8×128 matches the f32 register tile, so the lerp vectorizes perfectly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR, TC = 8, 128  # tile rows/cols (f32 register tile)


def tile_mean_flow(flow: jax.Array, tr: int = TR, tc: int = TC) -> jax.Array:
    """[H, W, 2] dense flow → [Ty, Tx, 2] per-tile mean."""
    h, w = flow.shape[:2]
    ty, tx = h // tr, w // tc
    v = flow[: ty * tr, : tx * tc]
    return v.reshape(ty, tr, tx, tc, 2).mean(axis=(1, 3))


def _split_offsets(tile_flow: jax.Array, time_t, sign: float, h: int, w: int):
    """Integer slab offsets + fractional weights for one frame.

    Frame A samples at pos - t*flow (sign=-t); frame B at pos + (1-t)*flow
    (sign=+(1-t)) — warp_blend.wgsl:35-37.
    """
    ty, tx = tile_flow.shape[:2]
    r0 = jnp.arange(ty, dtype=jnp.float32)[:, None] * TR
    c0 = jnp.arange(tx, dtype=jnp.float32)[None, :] * TC
    fy = r0 + sign * tile_flow[..., 1]
    fx = c0 + sign * tile_flow[..., 0]
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    fry = fy - y0
    frx = fx - x0
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - TR - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - TC - 1)
    return y0, x0, fry.astype(jnp.float32), frx.astype(jnp.float32)


# Frames are passed as 2D [H, W*4] u8 — a 3D [H, W, 4] u8 array would get its
# minor dim (4) padded to the 128-lane tile in HBM, quadrupling memory and
# breaking DMA slicing. Channels fold into lanes; the horizontal +1 texel
# shift becomes a +4-element shift.
LANES = 4  # channels interleaved in the lane dim


def _kernel(
    ya_ref, xa_ref, yb_ref, xb_ref, fa_ref, fb_ref, t_ref,
    a_hbm, b_hbm, out_ref, slab_a, slab_b, sem_a, sem_b,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    ca = pltpu.make_async_copy(
        a_hbm.at[pl.ds(ya_ref[ti, tj], TR + 1), pl.ds(xa_ref[ti, tj] * LANES, (TC + 1) * LANES)],
        slab_a,
        sem_a,
    )
    cb = pltpu.make_async_copy(
        b_hbm.at[pl.ds(yb_ref[ti, tj], TR + 1), pl.ds(xb_ref[ti, tj] * LANES, (TC + 1) * LANES)],
        slab_b,
        sem_b,
    )
    ca.start()
    cb.start()

    t = t_ref[0]
    wl = TC * LANES

    def lerp(slab, fry, frx):
        # Mosaic has no direct u8<->f32 cast; hop through int32
        s = slab[:].astype(jnp.int32).astype(jnp.float32)
        top = s[:TR, :wl] + frx * (s[:TR, LANES : wl + LANES] - s[:TR, :wl])
        bot = s[1 : TR + 1, :wl] + frx * (
            s[1 : TR + 1, LANES : wl + LANES] - s[1 : TR + 1, :wl]
        )
        return top + fry * (bot - top)

    ca.wait()
    va = lerp(slab_a, fa_ref[ti, tj, 0], fa_ref[ti, tj, 1])
    cb.wait()
    vb = lerp(slab_b, fb_ref[ti, tj, 0], fb_ref[ti, tj, 1])
    mixed = va + (vb - va) * t
    out_ref[:] = jnp.round(jnp.clip(mixed, 0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)


@functools.lru_cache(maxsize=32)
def _build(h: int, w: int):
    ty, tx = h // TR, w // TC

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(ty, tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # frame A (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # frame B (HBM)
        ],
        out_specs=pl.BlockSpec(
            (TR, TC * LANES), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TR + 1, (TC + 1) * LANES), jnp.uint8),
            pltpu.VMEM((TR + 1, (TC + 1) * LANES), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((ty * TR, tx * TC * LANES), jnp.uint8),
        grid_spec=grid_spec,
        # interpret mode on CPU (tests); compiled Mosaic on TPU
        interpret=jax.default_backend() == "cpu",
    )

    def fn(frame_a, frame_b, tile_flow, time_t):
        t_arr = jnp.asarray([time_t], jnp.float32)
        ya, xa, fry_a, frx_a = _split_offsets(tile_flow, time_t, -t_arr[0], h, w)
        yb, xb, fry_b, frx_b = _split_offsets(tile_flow, time_t, (1.0 - t_arr[0]), h, w)
        fa = jnp.stack([fry_a, frx_a], axis=-1)
        fb = jnp.stack([fry_b, frx_b], axis=-1)
        a2 = frame_a.reshape(h, w * LANES)
        b2 = frame_b.reshape(h, w * LANES)
        out = call(ya, xa, yb, xb, fa, fb, t_arr, a2, b2)
        out = out.reshape(out.shape[0], out.shape[1] // LANES, LANES)
        if out.shape[:2] != (h, w):  # uncovered edge: fall back to blend there
            pad_h, pad_w = h - out.shape[0], w - out.shape[1]
            out = jnp.pad(out, ((0, pad_h), (0, pad_w), (0, 0)))
            # edge strips use plain cross-fade
            a = frame_a.astype(jnp.float32)
            b = frame_b.astype(jnp.float32)
            fade = jnp.clip(
                jnp.round(a + (b - a) * time_t), 0, 255
            ).astype(jnp.uint8)
            mask_y = (jnp.arange(h) < out.shape[0] - pad_h)[:, None, None]
            mask_x = (jnp.arange(w) < out.shape[1] - pad_w)[None, :, None]
            out = jnp.where(mask_y & mask_x, out, fade)
        return out

    return fn


def block_warp_blend(
    frame_a: jax.Array, frame_b: jax.Array, flow: jax.Array, time_t
) -> jax.Array:
    """Block-motion-compensated blend; u8 [H,W,4] × 2 + dense flow → u8.

    H must be a multiple of 8 and W of 128 for full coverage (1080p/4K are);
    ragged edges fall back to cross-fade.
    """
    h, w = frame_a.shape[:2]
    tf = tile_mean_flow(flow)
    return _build(h, w)(frame_a, frame_b, tf, time_t)


# ---------------------------------------------------------------------------
# numpy golden (for tests)
# ---------------------------------------------------------------------------


def block_warp_blend_ref(
    a_u8: np.ndarray, b_u8: np.ndarray, flow: np.ndarray, time_t: float
) -> np.ndarray:
    h, w = a_u8.shape[:2]
    ty, tx = h // TR, w // TC
    tf = (
        flow[: ty * TR, : tx * TC]
        .reshape(ty, TR, tx, TC, 2)
        .mean(axis=(1, 3))
    )
    out = np.empty((ty * TR, tx * TC, 4), np.float32)

    def sample(img, y0, x0, fry, frx):
        s = img[y0 : y0 + TR + 1, x0 : x0 + TC + 1].astype(np.float32)
        top = s[:TR, :TC] + frx * (s[:TR, 1:] - s[:TR, :TC])
        bot = s[1:, :TC] + frx * (s[1:, 1:] - s[1:, :TC])
        return top + fry * (bot - top)

    for ti in range(ty):
        for tj in range(tx):
            mv = tf[ti, tj]
            for img, sign, dst in ((a_u8, -time_t, 0), (b_u8, 1.0 - time_t, 1)):
                fy = ti * TR + sign * mv[1]
                fx = tj * TC + sign * mv[0]
                y0 = int(np.clip(np.floor(fy), 0, h - TR - 1))
                x0 = int(np.clip(np.floor(fx), 0, w - TC - 1))
                v = sample(img, y0, x0, np.float32(fy - np.floor(fy)), np.float32(fx - np.floor(fx)))
                if dst == 0:
                    va = v
                else:
                    vb = v
            mixed = va + (vb - va) * np.float32(time_t)
            out[ti * TR : (ti + 1) * TR, tj * TC : (tj + 1) * TC] = mixed
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
