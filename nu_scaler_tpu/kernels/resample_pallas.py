"""Pallas TPU kernel: fused block-banded separable resample.

Same math as `ops/resample._banded_body` (per-output-tile small matmuls over
two-block input slabs) but hand-tiled: the u8→f32 unpack, the banded
contraction and the f32→u8 trunc pack all happen on VMEM-resident tiles, so
the f32 intermediates of the XLA version never round-trip HBM.

Everything here uses ONLY static BlockSpecs — block index maps `t → t` and
`t → t+1` give each grid step its slab halo without dynamic `memref_slice`
(unsupported on this backend) or gathers (ditto).

Layout note: frames travel as 2D u8 [rows, W*4] — a trailing dim of 4 would
be padded to the 128-lane tile in HBM (4× memory, broken slicing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nu_scaler_tpu.ops import resample as _r

LANES = 4  # RGBA interleaved in the lane dim


def _vert_kernel(w_ref, b0_ref, b1_ref, out_ref):
    """out_tile [tc, W*4] f32 = W_t [tc, s2] @ concat(b0, b1) [s2, W*4]."""
    slab = jnp.concatenate(
        [b0_ref[:].astype(jnp.int32), b1_ref[:].astype(jnp.int32)], axis=0
    ).astype(jnp.float32) * (1.0 / 255.0)
    out_ref[:] = jax.lax.dot_general(
        w_ref[0],
        slab,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _horiz_kernel(w_ref, b0_ref, b1_ref, out_ref):
    """Horizontal pass on f32 rows.

    b0/b1: [tr, stride*4] with RGBA interleaved in lanes. Mosaic can't
    reshape across lanes ((8,512)→(8,128,4) is unsupported), so the weights
    arrive pre-expanded as kron(W_t, I4) [s2*4, tc*4] and the contraction
    runs directly on interleaved lanes.
    """
    slab = jnp.concatenate([b0_ref[:], b1_ref[:]], axis=1)
    out = jax.lax.dot_general(
        slab,
        w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tr, tc*4]
    out_ref[:] = jnp.trunc(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.int32).astype(
        jnp.uint8
    )


@functools.lru_cache(maxsize=64)
def make_pallas_resampler(in_h: int, in_w: int, out_h: int, out_w: int, algorithm: str):
    """u8 [H, W, 4] → u8 [OH, OW, 4], or None when the banded form doesn't
    tile for these sizes."""
    algorithm = _r.normalize_algorithm(algorithm)
    bv = _r._banded_axis(in_h, out_h, algorithm)
    bh = _r._banded_axis(in_w, out_w, algorithm)
    if bv is None or bh is None:
        return None
    av, stride_v, halo_v, tc_v, t_v = bv
    ah, stride_h, halo_h, tc_h, t_h = bh

    interpret = jax.default_backend() == "cpu"
    wv = jnp.asarray(av.transpose(0, 2, 1))  # [t, tc, s2]
    # horizontal weights expanded over interleaved RGBA lanes: kron(W, I4)
    eye4 = np.eye(LANES, dtype=np.float32)
    wh = jnp.asarray(np.kron(ah, eye4[None]))  # [t, s2*4, tc*4]

    wl = in_w * LANES
    vert = pl.pallas_call(
        _vert_kernel,
        out_shape=jax.ShapeDtypeStruct((t_v * tc_v, wl), jnp.float32),
        grid=(t_v,),
        in_specs=[
            pl.BlockSpec((1, tc_v, 2 * stride_v), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride_v, wl), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride_v, wl), lambda t: (t + 1, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc_v, wl), lambda t: (t, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    # horizontal: grid over (row tiles, col tiles)
    TRH = 8
    rows_p = -(-out_h // TRH) * TRH
    horiz = pl.pallas_call(
        _horiz_kernel,
        out_shape=jax.ShapeDtypeStruct((rows_p, t_h * tc_h * LANES), jnp.uint8),
        grid=(rows_p // TRH, t_h),
        in_specs=[
            pl.BlockSpec((1, 2 * stride_h * LANES, tc_h * LANES), lambda r, t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TRH, stride_h * LANES), lambda r, t: (r, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((TRH, stride_h * LANES), lambda r, t: (r, t + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TRH, tc_h * LANES), lambda r, t: (r, t), memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    total_v = (t_v + 1) * stride_v
    total_h = (t_h + 1) * stride_h

    def fn(img_u8: jax.Array) -> jax.Array:
        flat = img_u8.reshape(in_h, wl)
        flat = jnp.pad(flat, ((halo_v, total_v - halo_v - in_h), (0, 0)))
        mid = vert(wv, flat, flat)  # [t_v*tc_v, W*4] f32
        mid = mid[:out_h]
        # pad cols for the horizontal slabs + rows to the row-tile multiple
        midp = jnp.pad(
            mid,
            (
                (0, rows_p - out_h),
                (halo_h * LANES, (total_h - halo_h - in_w) * LANES),
            ),
        )
        out = horiz(wh, midp, midp)
        return out[:out_h, : out_w * LANES].reshape(out_h, out_w, LANES)

    return jax.jit(fn)


def pallas_resample_available(in_h: int, in_w: int, out_h: int, out_w: int, algorithm: str) -> bool:
    return make_pallas_resampler(in_h, in_w, out_h, out_w, algorithm) is not None


@functools.lru_cache(maxsize=64)
def make_pallas_fused_batched(
    n: int, in_h: int, in_w: int, out_h: int, out_w: int, algorithm: str
):
    """Batched fused resampler: u8 [N, H, W, 4] → u8 [N, OH, OW, 4] in ONE
    pallas_call with a leading batch grid dim (the rayon-batch role,
    upscale/mod.rs:609-640, as one device program). Returns None when the
    banded form doesn't tile."""
    algorithm = _r.normalize_algorithm(algorithm)
    bv = _r._banded_axis(in_h, out_h, algorithm)
    bh = _r._banded_axis(in_w, out_w, algorithm)
    if bv is None or bh is None:
        return None
    av, stride_v, halo_v, tc_v, t_v = bv
    ah, stride_h, halo_h, tc_h, t_h = bh

    def split2(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - np.asarray(hi).astype(np.float32)).astype(jnp.bfloat16)
        return np.stack([np.asarray(hi), np.asarray(lo)])

    wv = jnp.asarray(split2(av.transpose(0, 2, 1)).transpose(1, 0, 2, 3))
    eye4 = np.eye(LANES, dtype=np.float32)
    wh = jnp.asarray(split2(np.kron(ah, eye4[None])).transpose(1, 0, 2, 3))

    interpret = jax.default_backend() == "cpu"
    shl = stride_h * LANES
    # batch is the INNERMOST grid dim: the (i, j) weight blocks then stay
    # resident across the whole batch instead of being re-streamed per frame
    call = pl.pallas_call(
        _fused_kernel_batched,
        out_shape=jax.ShapeDtypeStruct((n, t_v * tc_v, t_h * tc_h * LANES), jnp.uint8),
        grid=(t_v, t_h, n),
        in_specs=[
            pl.BlockSpec((1, 2, tc_v, 2 * stride_v), lambda i, j, b: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2 * shl, tc_h * LANES), lambda i, j, b: (j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, stride_v, shl), lambda i, j, b: (b, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, stride_v, shl), lambda i, j, b: (b, i, j + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, stride_v, shl), lambda i, j, b: (b, i + 1, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, stride_v, shl), lambda i, j, b: (b, i + 1, j + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tc_v, tc_h * LANES), lambda i, j, b: (b, i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )

    total_v = (t_v + 1) * stride_v
    total_h = (t_h + 1) * stride_h

    def fn(imgs_u8: jax.Array) -> jax.Array:
        flat = imgs_u8.reshape(n, in_h, in_w * LANES)
        flat = jnp.pad(
            flat,
            (
                (0, 0),
                (halo_v, total_v - halo_v - in_h),
                (halo_h * LANES, (total_h - halo_h - in_w) * LANES),
            ),
        )
        out = call(wv, wh, flat, flat, flat, flat)
        return out[:, :out_h, : out_w * LANES].reshape(n, out_h, out_w, LANES)

    return fn


def _fused_kernel_batched(wv_ref, wh_ref, b00, b01, b10, b11, out_ref):
    """Batched variant: data blocks carry a leading batch dim of 1."""
    top = jnp.concatenate([b00[0], b01[0]], axis=1)
    bot = jnp.concatenate([b10[0], b11[0]], axis=1)
    slab = jnp.concatenate([top, bot], axis=0)
    slab16 = slab.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    def split_dot(w2, x, dims):
        hi = jax.lax.dot_general(w2[0], x, dimension_numbers=dims,
                                 preferred_element_type=jnp.float32)
        lo = jax.lax.dot_general(w2[1], x, dimension_numbers=dims,
                                 preferred_element_type=jnp.float32)
        return hi + lo

    dims = (((1,), (0,)), ((), ()))
    mid = split_dot(wv_ref[0], slab16, dims)
    mid16 = mid.astype(jnp.bfloat16)
    out = split_dot(
        jnp.transpose(wh_ref[0], (0, 2, 1)), jnp.transpose(mid16), dims
    )
    out = jnp.transpose(out)
    out_ref[0] = (
        jnp.trunc(jnp.clip(out, 0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)
    )


# ---------------------------------------------------------------------------
# fully-fused single-kernel variant
# ---------------------------------------------------------------------------
#
# One pallas_call does BOTH separable passes per output tile: the f32
# intermediate never touches HBM (the two-call version writes+reads ~132 MB
# of it per 4K frame). Each grid step (i, j) reads a 2×2 block neighborhood
# (row slabs i, i+1 × col slabs j, j+1), contracts vertically then
# horizontally with bf16 hi/lo-split weights (split_bf16 numerics, ≥50 dB),
# and writes one u8 tile.


def _fused_kernel(wv_ref, wh_ref, b00, b01, b10, b11, out_ref):
    top = jnp.concatenate([b00[:], b01[:]], axis=1)
    bot = jnp.concatenate([b10[:], b11[:]], axis=1)
    slab = jnp.concatenate([top, bot], axis=0)  # [2sv, 2sh*4] u8
    slab16 = slab.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    def split_dot(w2, x, dims):
        hi = jax.lax.dot_general(w2[0], x, dimension_numbers=dims,
                                 preferred_element_type=jnp.float32)
        lo = jax.lax.dot_general(w2[1], x, dimension_numbers=dims,
                                 preferred_element_type=jnp.float32)
        return hi + lo

    dims = (((1,), (0,)), ((), ()))
    mid = split_dot(wv_ref[0], slab16, dims)  # [tc_v, 2sh*4] f32
    mid16 = mid.astype(jnp.bfloat16)
    out = split_dot(
        jnp.transpose(wh_ref[0], (0, 2, 1)), jnp.transpose(mid16), dims
    )  # wh [2, 2sh*4, tcl] -> transposed [2, tcl, 2sh*4] @ mid16.T [2sh*4, tc_v]
    out = jnp.transpose(out)  # [tc_v, tc_h*4]
    out_ref[:] = (
        jnp.trunc(jnp.clip(out, 0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)
    )


@functools.lru_cache(maxsize=64)
def make_pallas_fused(in_h: int, in_w: int, out_h: int, out_w: int, algorithm: str):
    """Fused both-axes resampler; returns None when the banded form doesn't
    tile. Numerics: split_bf16 on raw u8-range samples (matches the XLA
    production path)."""
    algorithm = _r.normalize_algorithm(algorithm)
    bv = _r._banded_axis(in_h, out_h, algorithm)
    bh = _r._banded_axis(in_w, out_w, algorithm)
    if bv is None or bh is None:
        return None
    av, stride_v, halo_v, tc_v, t_v = bv
    ah, stride_h, halo_h, tc_h, t_h = bh

    def split2(a):  # np [.., ..] f32 → stacked bf16 [2, ...]
        hi = a.astype(jnp.bfloat16)
        lo = (a - np.asarray(hi).astype(np.float32)).astype(jnp.bfloat16)
        return np.stack([np.asarray(hi), np.asarray(lo)])

    # vertical: [t, 2, tc, 2sv]; horizontal kron over lanes: [t, 2, 2sh*4, tc*4]
    wv = jnp.asarray(split2(av.transpose(0, 2, 1)).transpose(1, 0, 2, 3))
    eye4 = np.eye(LANES, dtype=np.float32)
    ah_kron = np.kron(ah, eye4[None])
    wh = jnp.asarray(split2(ah_kron).transpose(1, 0, 2, 3))

    interpret = jax.default_backend() == "cpu"
    shl = stride_h * LANES
    call = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((t_v * tc_v, t_h * tc_h * LANES), jnp.uint8),
        grid=(t_v, t_h),
        in_specs=[
            pl.BlockSpec((1, 2, tc_v, 2 * stride_v), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2 * shl, tc_h * LANES), lambda i, j: (j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride_v, shl), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride_v, shl), lambda i, j: (i, j + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride_v, shl), lambda i, j: (i + 1, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride_v, shl), lambda i, j: (i + 1, j + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tc_v, tc_h * LANES), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )

    total_v = (t_v + 1) * stride_v
    total_h = (t_h + 1) * stride_h

    def fn(img_u8: jax.Array) -> jax.Array:
        flat = img_u8.reshape(in_h, in_w * LANES)
        flat = jnp.pad(
            flat,
            (
                (halo_v, total_v - halo_v - in_h),
                (halo_h * LANES, (total_h - halo_h - in_w) * LANES),
            ),
        )
        out = call(wv, wh, flat, flat, flat, flat)
        return out[:out_h, : out_w * LANES].reshape(out_h, out_w, LANES)

    return jax.jit(fn)


def _fused_blend_kernel(wv_ref, wh_ref, b00, b01, b10, b11, prev_ref,
                        out_ref, *mid_refs, time_ts: tuple):
    """_fused_kernel + amortized-blend epilogue: emits the upscaled tile AND
    `blend_only(prev_tile, upscaled_tile, t)` for EVERY t in `time_ts` in
    one pass — 2× interpolation is one mid; 3×/4× frame generation is two/
    three extra cheap VPU mixes on the same VMEM-resident tiles."""
    top = jnp.concatenate([b00[:], b01[:]], axis=1)
    bot = jnp.concatenate([b10[:], b11[:]], axis=1)
    slab = jnp.concatenate([top, bot], axis=0)  # [2sv, 2sh*4] u8
    slab16 = slab.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    def split_dot(w2, x, dims):
        hi = jax.lax.dot_general(w2[0], x, dimension_numbers=dims,
                                 preferred_element_type=jnp.float32)
        lo = jax.lax.dot_general(w2[1], x, dimension_numbers=dims,
                                 preferred_element_type=jnp.float32)
        return hi + lo

    dims = (((1,), (0,)), ((), ()))
    mid = split_dot(wv_ref[0], slab16, dims)
    mid16 = mid.astype(jnp.bfloat16)
    out = split_dot(
        jnp.transpose(wh_ref[0], (0, 2, 1)), jnp.transpose(mid16), dims
    )
    out = jnp.transpose(out)
    res_i32 = jnp.trunc(jnp.clip(out, 0.0, 255.0)).astype(jnp.int32)
    out_ref[:] = res_i32.astype(jnp.uint8)
    # blend_only semantics on the TRUNCATED u8 result (ops/interpolate.py:
    # 358) — computed as the EXACT mix round(a + (b−a)·t): u8 values and
    # binary-fraction t are f32-exact, so this is the true rounding;
    # blend_only's ×(1/255)→×255 f32 roundtrip perturbs exact .5 ties by
    # ≤1 ulp, so the two paths may differ by ±1 on ties (gated in tests)
    a = prev_ref[:].astype(jnp.int32).astype(jnp.float32)
    b = res_i32.astype(jnp.float32)
    for mid_ref, t in zip(mid_refs, time_ts):
        mix = a + (b - a) * jnp.float32(t)
        mid_ref[:] = (
            jnp.clip(jnp.round(mix), 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
        )


@functools.lru_cache(maxsize=16)
def make_pallas_fused_blend(
    in_h: int, in_w: int, out_h: int, out_w: int, algorithm: str,
    time_t=0.5,
):
    """Amortized-interpolation step as ONE kernel: ``(cur_u8 [H, W, 4],
    prev_up_2d u8 [t_v·tc_v, t_h·tc_h·4]) → (cur_up_2d, mid_2d, ...)``
    where cur_up_2d is the fused-resampler 4K product (padded 2D form, feed
    it back as next step's prev) and each mid == blend_only(prev, cur_up,
    t) on the same padded grid. ``time_t`` may be a float (2× interp, one
    mid) or a tuple of floats (N-factor frame generation — e.g. (1/3, 2/3)
    emits two mids + the upscale, THREE output frames from one kernel pass).
    Slice ``[:out_h, :out_w*4].reshape(out_h, out_w, 4)`` for consumers.
    None when the banded form doesn't tile."""
    ts = tuple(float(t) for t in time_t) if isinstance(time_t, (tuple, list)) \
        else (float(time_t),)
    algorithm = _r.normalize_algorithm(algorithm)
    bv = _r._banded_axis(in_h, out_h, algorithm)
    bh = _r._banded_axis(in_w, out_w, algorithm)
    if bv is None or bh is None:
        return None
    av, stride_v, halo_v, tc_v, t_v = bv
    ah, stride_h, halo_h, tc_h, t_h = bh

    def split2(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - np.asarray(hi).astype(np.float32)).astype(jnp.bfloat16)
        return np.stack([np.asarray(hi), np.asarray(lo)])

    wv = jnp.asarray(split2(av.transpose(0, 2, 1)).transpose(1, 0, 2, 3))
    eye4 = np.eye(LANES, dtype=np.float32)
    wh = jnp.asarray(split2(np.kron(ah, eye4[None])).transpose(1, 0, 2, 3))

    interpret = jax.default_backend() == "cpu"
    shl = stride_h * LANES
    out2d = (t_v * tc_v, t_h * tc_h * LANES)
    call = pl.pallas_call(
        functools.partial(_fused_blend_kernel, time_ts=ts),
        out_shape=tuple(
            jax.ShapeDtypeStruct(out2d, jnp.uint8) for _ in range(1 + len(ts))
        ),
        grid=(t_v, t_h),
        in_specs=[
            pl.BlockSpec((1, 2, tc_v, 2 * stride_v), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2 * shl, tc_h * LANES), lambda i, j: (j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride_v, shl), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride_v, shl), lambda i, j: (i, j + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride_v, shl), lambda i, j: (i + 1, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((stride_v, shl), lambda i, j: (i + 1, j + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc_v, tc_h * LANES), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((tc_v, tc_h * LANES), lambda i, j: (i, j), memory_space=pltpu.VMEM)
            for _ in range(1 + len(ts))
        ),
        interpret=interpret,
    )

    total_v = (t_v + 1) * stride_v
    total_h = (t_h + 1) * stride_h

    @jax.jit
    def _fn(cur_u8: jax.Array, prev_up_2d: jax.Array):
        flat = cur_u8.reshape(in_h, in_w * LANES)
        flat = jnp.pad(
            flat,
            (
                (halo_v, total_v - halo_v - in_h),
                (halo_h * LANES, (total_h - halo_h - in_w) * LANES),
            ),
        )
        return call(wv, wh, flat, flat, flat, flat, prev_up_2d)

    def fn(cur_u8: jax.Array, prev_up_2d: jax.Array):
        return _fn(cur_u8, prev_up_2d)

    fn.out2d = out2d
    fn.out_hw = (out_h, out_w)
    return fn
