"""Pallas TPU kernel: overlapped-tile (soft) motion-compensated warp/blend.

The XLA soft warp (`ops/interpolate._soft_warp_accumulate`) removes block
seams by bilinearly blending per-tile candidate warps — but it pays K=8
candidate slabs × 2 frames of full-image bf16 accumulator read-modify-writes
in HBM (~2.5 ms/pair at 1080p, the measured flow_soft overhead; TODO r2).

This kernel restructures the same math around the bilinear blend's locality:
on the HALF-TILE-OFFSET cell grid, a pixel's blend only ever mixes the 4
surrounding tile centers. Per (tile-sized) cell it therefore needs at most
4 slab DMAs per frame — each corner tile's integer block offset — and the
whole K-term accumulation collapses into VMEM:

  out(p) = Σ_f w_f Σ_{c ∈ 4 corners} bw_c(p) · bilerp(frame_f,
               p + q_c + frac_c(p)),     w_A = 1−t, w_B = t

  * bw_c(p): the in-cell bilinear corner basis ((1−fy)(1−fx), …) — exactly
    the XLA path's half-tile-shifted tile→pixel upsample.
  * q_c: floor of corner-tile mean motion (per frame), clipped to ±rng.
  * frac_c(p) = clip(smooth(p) − q_c, 0, 1): subpixel fraction against the
    bilinearly-smoothed motion field, like the XLA path — but each corner
    uses ITS OWN tile's integer offset (no global top-K quantization), and
    the column lerp is exact per-pixel (the XLA path's P/Q one-lane-right
    approximation isn't needed when slabs sit in VMEM).
  * corners with identical offsets are deduplicated at run time (scalar
    compare + `pl.when`): smooth-motion cells do 1 DMA + 1 bilerp per frame
    instead of 4.

Reference lineage: overlapped-block MC is the classic de-blocking of the
block matcher the reference shipped CPU-side (`Nu_scale/src/upscale/
fsr3.rs:319-376`, `interpolation/mod.rs` BlockMatchingInterpolator).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 4  # RGBA interleaved in the lane dim (2D [H, W*4] u8 frames)


def _corner_stack(field: jax.Array) -> jax.Array:
    """[Ty, Tx] tile field → [Ty+1, Tx+1, 4] per-cell corner values
    (tl, tr, bl, br), edge-clamped."""
    p = jnp.pad(field, ((1, 1), (1, 1)), mode="edge")
    return jnp.stack([p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=-1)


def _tile_mean(field: jax.Array, th: int, tw: int) -> jax.Array:
    h, w = field.shape[:2]
    ty, tx = h // th, w // tw
    v = field[: ty * th, : tx * tw]
    return v.reshape(ty, th, tx, tw, 2).mean(axis=(1, 3))


def _kernel(
    # scalar prefetch
    oy_a, ox_a, sy_a, sx_a, oy_b, ox_b, sy_b, sx_b, t_ref,
    # inputs (HBM)
    a_hbm, b_hbm,
    # output
    out_ref,
    # scratch
    s_a0, s_a1, s_a2, s_a3, s_b0, s_b1, s_b2, s_b3, acc,
    m_a0, m_a1, m_a2, m_a3, m_b0, m_b1, m_b2, m_b3,
    *, th, tw, pad_y, pad_x,
):
    cy = pl.program_id(0)
    cx = pl.program_id(1)
    wl = tw * LANES

    cell_r0 = cy * th - th // 2
    cell_c0 = cx * tw - tw // 2

    # in-cell fractions (pixel granularity; fx broadcast over the 4 lanes)
    ly = jax.lax.broadcasted_iota(jnp.float32, (th, wl), 0)
    lx = (jax.lax.broadcasted_iota(jnp.int32, (th, wl), 1) // LANES).astype(
        jnp.float32
    )
    fy = (ly + 0.5) * (1.0 / th)
    fx = (lx + 0.5) * (1.0 / tw)

    basis = (
        (1.0 - fy) * (1.0 - fx),  # tl
        (1.0 - fy) * fx,          # tr
        fy * (1.0 - fx),          # bl
        fy * fx,                  # br
    )

    acc[...] = jnp.zeros_like(acc)

    for (oy, ox, sy, sx, hbm, slabs, sems, wgt) in (
        (oy_a, ox_a, sy_a, sx_a, a_hbm, (s_a0, s_a1, s_a2, s_a3),
         (m_a0, m_a1, m_a2, m_a3), 1.0 - t_ref[0]),
        (oy_b, ox_b, sy_b, sx_b, b_hbm, (s_b0, s_b1, s_b2, s_b3),
         (m_b0, m_b1, m_b2, m_b3), t_ref[0]),
    ):
        o_y = [oy[cy, cx, c] for c in range(4)]
        o_x = [ox[cy, cx, c] for c in range(4)]

        # smoothed motion fields across the cell (bilinear of corner means)
        sm_y = (
            (1.0 - fy) * ((1.0 - fx) * sy[cy, cx, 0] + fx * sy[cy, cx, 1])
            + fy * ((1.0 - fx) * sy[cy, cx, 2] + fx * sy[cy, cx, 3])
        )
        sm_x = (
            (1.0 - fy) * ((1.0 - fx) * sx[cy, cx, 0] + fx * sx[cy, cx, 1])
            + fy * ((1.0 - fx) * sx[cy, cx, 2] + fx * sx[cy, cx, 3])
        )

        # run-time corner dedupe: assign each corner to the lowest-indexed
        # corner with the same integer offset
        dup = {}
        for c in range(1, 4):
            for e in range(c):
                dup[(c, e)] = jnp.logical_and(o_y[c] == o_y[e], o_x[c] == o_x[e])
        first = [None] * 4
        first[0] = jnp.bool_(True)
        first[1] = jnp.logical_not(dup[(1, 0)])
        first[2] = jnp.logical_not(jnp.logical_or(dup[(2, 0)], dup[(2, 1)]))
        first[3] = jnp.logical_not(
            jnp.logical_or(dup[(3, 0)], jnp.logical_or(dup[(3, 1)], dup[(3, 2)]))
        )

        # start DMAs for first-occurrence corners
        copies = [None] * 4
        for c in range(4):
            copies[c] = pltpu.make_async_copy(
                hbm.at[
                    pl.ds(o_y[c], th + 1),
                    pl.ds(o_x[c] * LANES, (tw + 1) * LANES),
                ],
                slabs[c],
                sems[c],
            )

            @pl.when(first[c])
            def _(c=c):
                copies[c].start()

        for c in range(4):
            # effective weight: own basis + bases of later corners that
            # dedupe to c (each later corner folds into its FIRST equal)
            w_eff = basis[c]
            for j in range(c + 1, 4):
                folds = dup[(j, c)]
                for e in range(c):
                    folds = jnp.logical_and(folds, jnp.logical_not(dup[(j, e)]))
                w_eff = w_eff + jnp.where(folds, basis[j], 0.0)

            @pl.when(first[c])
            def _(c=c, w_eff=w_eff):
                copies[c].wait()
                s = slabs[c][:].astype(jnp.int32).astype(jnp.float32)
                # subpixel fractions vs the smooth field, per pixel
                qy_c = (o_y[c] - pad_y - cell_r0).astype(jnp.float32)
                qx_c = (o_x[c] - pad_x - cell_c0).astype(jnp.float32)
                fyc = jnp.clip(sm_y - qy_c, 0.0, 1.0)
                fxc = jnp.clip(sm_x - qx_c, 0.0, 1.0)
                top = s[:th, :wl] + fxc * (s[:th, LANES : wl + LANES] - s[:th, :wl])
                bot = s[1 : th + 1, :wl] + fxc * (
                    s[1 : th + 1, LANES : wl + LANES] - s[1 : th + 1, :wl]
                )
                acc[...] += (wgt * w_eff) * (top + fyc * (bot - top))

    out_ref[...] = (
        jnp.round(jnp.clip(acc[...], 0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)
    )


@functools.lru_cache(maxsize=16)
def _build(h: int, w: int, th: int, tw: int, rng: int):
    ty, tx = h // th, w // tw
    cy, cx = ty + 1, tx + 1
    pad_y = rng + th // 2 + 2
    pad_x = rng + tw // 2 + 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(cy, cx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # frame A padded (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # frame B padded (HBM)
        ],
        out_specs=pl.BlockSpec(
            (th, tw * LANES), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            *([pltpu.VMEM((th + 1, (tw + 1) * LANES), jnp.uint8)] * 8),
            pltpu.VMEM((th, tw * LANES), jnp.float32),
            *([pltpu.SemaphoreType.DMA] * 8),
        ],
    )
    call = pl.pallas_call(
        functools.partial(_kernel, th=th, tw=tw, pad_y=pad_y, pad_x=pad_x),
        out_shape=jax.ShapeDtypeStruct((cy * th, cx * tw * LANES), jnp.uint8),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )

    def fn(frame_a, frame_b, flow, time_t):
        t_arr = jnp.asarray([time_t], jnp.float32)

        def prefetch(sign):
            tiles = _tile_mean(sign * flow, th, tw)
            tiles = jnp.clip(tiles, -rng, rng)
            q = jnp.floor(tiles).astype(jnp.int32)
            cell_r0 = (
                jnp.arange(cy, dtype=jnp.int32)[:, None, None] * th - th // 2
            )
            cell_c0 = (
                jnp.arange(cx, dtype=jnp.int32)[None, :, None] * tw - tw // 2
            )
            oy = _corner_stack(q[..., 1]) + cell_r0 + pad_y
            ox = _corner_stack(q[..., 0]) + cell_c0 + pad_x
            sy = _corner_stack(tiles[..., 1]).astype(jnp.float32)
            sx = _corner_stack(tiles[..., 0]).astype(jnp.float32)
            return oy, ox, sy, sx

        oy_a, ox_a, sy_a, sx_a = prefetch(-t_arr[0])
        oy_b, ox_b, sy_b, sx_b = prefetch(1.0 - t_arr[0])

        ap = jnp.pad(
            frame_a, ((pad_y, pad_y + th), (pad_x, pad_x + tw), (0, 0)), mode="edge"
        ).reshape(h + 2 * pad_y + th, -1)
        bp = jnp.pad(
            frame_b, ((pad_y, pad_y + th), (pad_x, pad_x + tw), (0, 0)), mode="edge"
        ).reshape(h + 2 * pad_y + th, -1)

        out = call(
            oy_a, ox_a, sy_a, sx_a, oy_b, ox_b, sy_b, sx_b, t_arr, ap, bp
        )
        hh, hw = th // 2, tw // 2
        out = out[hh : hh + h, hw * LANES : (hw + w) * LANES]
        return out.reshape(h, w, LANES)

    return fn


def soft_warp_blend(
    frame_a: jax.Array,
    frame_b: jax.Array,
    flow: jax.Array,
    time_t,
    tile: tuple = (8, 128),
    rng: int = 48,
) -> jax.Array:
    """Overlapped-tile MC blend: u8 [H, W, 4] × 2 + dense flow [H, W, 2] →
    u8 [H, W, 4]. H must divide by tile[0] and W by tile[1] (1080p/4K do);
    use `ops.interpolate.warp_blend_fast(overlap=True)` for the general
    entry point (it falls back to the XLA soft path on ragged shapes).

    Alpha is motion-compensated alongside RGB (the XLA path cross-fades it);
    identical for the α≡255 frames the capture path produces.
    """
    h, w = frame_a.shape[:2]
    th, tw = tile
    if h % th or w % tw:
        raise ValueError(f"shape ({h}, {w}) must tile by {tile}")
    return _build(h, w, th, tw, rng)(frame_a, frame_b, flow, time_t)


# ---------------------------------------------------------------------------
# numpy golden (mirrors the kernel math exactly; tests)
# ---------------------------------------------------------------------------


def soft_warp_blend_ref(
    a_u8: np.ndarray, b_u8: np.ndarray, flow: np.ndarray, time_t: float,
    tile: tuple = (8, 128), rng: int = 48,
) -> np.ndarray:
    """Caveat: per-tile mean motions are floored to integer block offsets;
    when a tile mean lands EXACTLY on an integer, numpy's and XLA's
    summation order can floor to different (equally valid) offsets whose
    clipped fractions then sample up to 1 px apart. Tests must keep tile
    means off exact integers (real flows never sit on them)."""
    h, w = a_u8.shape[:2]
    th, tw = tile
    ty, tx = h // th, w // tw
    out = np.zeros((h, w, 4), np.float64)

    def corners(field):
        p = np.pad(field, ((1, 1), (1, 1)), mode="edge")
        return p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]

    for img, sign, wgt in ((a_u8, -time_t, 1.0 - time_t), (b_u8, 1.0 - time_t, time_t)):
        pad = rng + max(th, tw) // 2 + 2
        ip = np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge").astype(np.float64)
        tiles = (
            flow[: ty * th, : tx * tw].reshape(ty, th, tx, tw, 2).mean(axis=(1, 3))
            * sign
        )
        tiles = np.clip(tiles, -rng, rng)
        q = np.floor(tiles).astype(np.int64)
        qy_c = corners(q[..., 1])
        qx_c = corners(q[..., 0])
        sy_c = corners(tiles[..., 1])
        sx_c = corners(tiles[..., 0])
        for cy in range(ty + 1):
            for cx_ in range(tx + 1):
                r0, c0 = cy * th - th // 2, cx_ * tw - tw // 2
                for lr in range(th):
                    gr = r0 + lr
                    if not 0 <= gr < h:
                        continue
                    fyv = (lr + 0.5) / th
                    for lc in range(tw):
                        gc = c0 + lc
                        if not 0 <= gc < w:
                            continue
                        fxv = (lc + 0.5) / tw
                        bw = (
                            (1 - fyv) * (1 - fxv), (1 - fyv) * fxv,
                            fyv * (1 - fxv), fyv * fxv,
                        )
                        sm_y = (
                            (1 - fyv) * ((1 - fxv) * sy_c[0][cy, cx_] + fxv * sy_c[1][cy, cx_])
                            + fyv * ((1 - fxv) * sy_c[2][cy, cx_] + fxv * sy_c[3][cy, cx_])
                        )
                        sm_x = (
                            (1 - fyv) * ((1 - fxv) * sx_c[0][cy, cx_] + fxv * sx_c[1][cy, cx_])
                            + fyv * ((1 - fxv) * sx_c[2][cy, cx_] + fxv * sx_c[3][cy, cx_])
                        )
                        for c in range(4):
                            qy = qy_c[c][cy, cx_]
                            qx = qx_c[c][cy, cx_]
                            fy = np.clip(sm_y - qy, 0.0, 1.0)
                            fx = np.clip(sm_x - qx, 0.0, 1.0)
                            ry = pad + gr + qy
                            rx = pad + gc + qx
                            v = (
                                ip[ry, rx] * (1 - fy) * (1 - fx)
                                + ip[ry, rx + 1] * (1 - fy) * fx
                                + ip[ry + 1, rx] * fy * (1 - fx)
                                + ip[ry + 1, rx + 1] * fy * fx
                            )
                            out[gr, gc] += wgt * bw[c] * v
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
