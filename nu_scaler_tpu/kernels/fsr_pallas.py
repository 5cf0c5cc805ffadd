"""Pallas TPU kernel: fused EASU + RCAS for integer scale factors.

The XLA polyphase path (`ops/fsr._easu_polyphase_planar`) materializes the
s²·16 per-phase cubic-weight fields at input resolution through HBM (~5 GB of
VPU traffic at 1080p→4K — the round-1 bottleneck, 105 fps). Here one
pallas_call computes, per row strip, entirely in VMEM:

    direction field → s²×16 tap weights → EASU phase accumulation →
    cross-phase RCAS → u8 pack

so HBM sees only the planar f32 input once and the phase-planar u8 output
once. The phase interleave back to raster order stays outside (the banded
1-tap scatter matmuls run at memory speed, `ops/fsr._interleave_*`).

Reference semantics: FSR_EASU_SHADER + FSR_RCAS_SHADER
(`/root/reference/nu_scaler_core/src/upscale/fsr.rs:103-166,215-259`), same
math as `kernels/reference.easu_ref/rcas_ref` — PSNR-gated in
tests/test_fsr.py.

Halos use ONLY static BlockSpecs (t / t+1 two-block row slabs) and static
lane rolls — no dynamic memref slices, no gathers (both unsupported/slow on
this backend, see CLAUDE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-strip height (input rows of output produced per grid step). The kernel
# computes on strips of TH+2 rows (±1 EASU margin for RCAS) from a 2·TH slab.
# Measured on v5e (1080p→4K): th=8 → 1.83 ms; th=16/32 crash the Mosaic
# compile helper. Must be ≥ 5 (slab must contain the strip's ±2/+3 tap reach).
TH = 8
# column pad: left margin for the ±3 total (EASU tap + RCAS) column reach.
CL = 4

_LW = (0.299, 0.587, 0.114)  # RCAS luma weights (fsr.rs:231)


def _roll_cols(x: jax.Array, d: int) -> jax.Array:
    """out[..., c] = x[..., c+d] (static circular shift; the wrapped 3 border
    lanes land outside the final column slice)."""
    if d == 0:
        return x
    return pltpu.roll(x, (-d) % x.shape[-1], axis=x.ndim - 1)


def _fsr_cubic(d: jax.Array) -> jax.Array:
    """FsrCubic (fsr.rs:75-85)."""
    d2 = d * d
    d3 = d2 * d
    return jnp.where(
        d <= 1.0,
        2.0 - 1.5 * d - 0.5 * d3 + d2,
        jnp.where(d <= 2.0, -0.5 * d + 2.5 * d2 - d3, 0.0),
    )


def _make_kernel(
    scale: int, sharp: float, th: int, wp: int, in_h: int, in_w: int,
    batched: bool = False,
):
    s = scale
    reg = th + 2  # compute region rows: output rows ±1 (RCAS margin)

    def kernel(b0_ref, b1_ref, out_ref):
        if batched:
            b0, b1 = b0_ref[0], b1_ref[0]
        else:
            b0, b1 = b0_ref[:], b1_ref[:]
        slab = jnp.concatenate([b0, b1], axis=1)  # [3, 2th, wp]

        def rows(d: int) -> jax.Array:
            # EASU-region rows shifted by d: region row e covers original row
            # i*th - 1 + e, which sits at slab row e + 1 (host pads 2 rows up)
            return slab[:, 1 + d : 1 + d + reg, :]

        # --- direction field (phase-invariant) ---------------------------
        center = rows(0)
        vgx = (
            jnp.abs(rows(-1) - rows(1)).sum(axis=0) * (1.0 / 3.0)
        )  # [reg, wp]
        vgy = (
            jnp.abs(_roll_cols(center, -1) - _roll_cols(center, 1)).sum(axis=0)
            * (1.0 / 3.0)
        )
        norm = jnp.sqrt((vgx + 1e-4) ** 2 + (vgy + 1e-4) ** 2)
        dirx = (vgx + 1e-4) / norm
        diry = (vgy + 1e-4) / norm
        wx = jnp.abs(dirx) / (jnp.abs(dirx) + jnp.abs(diry))
        wy = 1.0 - wx

        # per-phase scalar-field offsets: dist = |tx·wx + ty·wy − off(φ)|
        offs = [
            ((px + 0.5) / s) * wx + ((py + 0.5) / s) * wy
            for py in range(s)
            for px in range(s)
        ]

        # --- EASU accumulation: taps outer, phases inner ------------------
        # (one tap image live at a time keeps VMEM ~linear in the strip size)
        n_ph = s * s
        sum_c = [jnp.zeros((3, reg, wp), jnp.float32) for _ in range(n_ph)]
        sum_w = [jnp.zeros((reg, wp), jnp.float32) for _ in range(n_ph)]
        for ty in range(4):
            r = rows(ty - 1)
            for tx in range(4):
                tap = _roll_cols(r, tx - 1)
                base = tx * wx + ty * wy
                for p in range(n_ph):
                    w = _fsr_cubic(jnp.abs(base - offs[p]))
                    sum_w[p] = sum_w[p] + w
                    sum_c[p] = sum_c[p] + tap * w[None]

        easu = []
        for p in range(n_ph):
            col = sum_c[p] / jnp.maximum(sum_w[p], 1e-4)[None]
            if sharp > 1e-3:
                col = col + (center - col) * jnp.float32(sharp)
            easu.append(col)

        # --- RCAS on the phase plane set ----------------------------------
        # output pixel (s·r+py, s·c+px): raster neighbors map to other
        # phases of the same/adjacent input pixel (fsr.rs:215-259 semantics
        # on the interleaved image, evaluated phase-planar here).
        lum = [
            _LW[0] * e[0] + _LW[1] * e[1] + _LW[2] * e[2] for e in easu
        ]  # [reg, wp] each

        def shift(x: jax.Array, dr: int, dc: int) -> jax.Array:
            # region rows [1, th+1) = this strip's output rows
            y = x[..., 1 + dr : 1 + dr + th, :]
            return _roll_cols(y, dc)

        # border clamp parity with the golden (rcas_ref clamps neighbor
        # indices at the OUTPUT image edge): at output row 0 / OH-1 and col
        # 0 / OW-1 the off-image neighbor is the center pixel itself. Only
        # the first/last phase rows/cols can sit on those borders.
        i = pl.program_id(1 if batched else 0)
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 0) + i * th
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1)
        top_mask = r_iota == 0
        bot_mask = r_iota == in_h - 1
        lef_mask = c_iota == CL
        rig_mask = c_iota == CL + in_w - 1

        for py in range(s):
            for px in range(s):
                p = py * s + px
                tp, tdr = (py - 1, 0) if py > 0 else (s - 1, -1)
                bp, bdr = (py + 1, 0) if py < s - 1 else (0, 1)
                lp, ldc = (px - 1, 0) if px > 0 else (s - 1, -1)
                rp, rdc = (px + 1, 0) if px < s - 1 else (0, 1)
                cen = shift(easu[p], 0, 0)
                top = shift(easu[tp * s + px], tdr, 0)
                bot = shift(easu[bp * s + px], bdr, 0)
                lef = shift(easu[py * s + lp], 0, ldc)
                rig = shift(easu[py * s + rp], 0, rdc)
                lc = shift(lum[p], 0, 0)
                lt = shift(lum[tp * s + px], tdr, 0)
                lb = shift(lum[bp * s + px], bdr, 0)
                ll = shift(lum[py * s + lp], 0, ldc)
                lr = shift(lum[py * s + rp], 0, rdc)
                if py == 0:
                    top = jnp.where(top_mask[None], cen, top)
                    lt = jnp.where(top_mask, lc, lt)
                if py == s - 1:
                    bot = jnp.where(bot_mask[None], cen, bot)
                    lb = jnp.where(bot_mask, lc, lb)
                if px == 0:
                    lef = jnp.where(lef_mask[None], cen, lef)
                    ll = jnp.where(lef_mask, lc, ll)
                if px == s - 1:
                    rig = jnp.where(rig_mask[None], cen, rig)
                    lr = jnp.where(rig_mask, lc, lr)
                min_l = jnp.minimum(
                    jnp.minimum(jnp.minimum(lt, lb), jnp.minimum(ll, lr)), lc
                )
                max_l = jnp.maximum(
                    jnp.maximum(jnp.maximum(lt, lb), jnp.maximum(ll, lr)), lc
                )
                t = jnp.clip((max_l - min_l) * (1.0 / 0.2), 0.0, 1.0)
                smooth = t * t * (3.0 - 2.0 * t)
                strength = jnp.float32(sharp) * (1.0 - smooth)
                lap = 4.0 * cen - top - bot - lef - rig
                out = cen + lap * strength[None]
                out_u8 = (
                    jnp.trunc(jnp.clip(out, 0.0, 1.0) * 255.0)
                    .astype(jnp.int32)
                    .astype(jnp.uint8)
                )
                if batched:
                    out_ref[0, p] = out_u8
                else:
                    out_ref[p] = out_u8

    return kernel


@functools.lru_cache(maxsize=32)
def make_fsr_phase_kernel(in_h: int, in_w: int, scale: int, sharp: float, th: int = TH):
    """Returns ``planar f32 [3, H, W] in [0,1] → u8 [s², 3, H, W]`` — fused
    EASU+RCAS phase planes, ready for the banded scatter interleave."""
    s = scale
    nb = -(-in_h // th)
    rows_p = (nb + 1) * th
    wp = -(-(in_w + CL + 3) // 128) * 128
    interpret = jax.default_backend() == "cpu"

    call = pl.pallas_call(
        _make_kernel(s, sharp, th, wp, in_h, in_w),
        out_shape=jax.ShapeDtypeStruct((s * s, 3, nb * th, wp), jnp.uint8),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, th, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, th, wp), lambda i: (0, i + 1, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (s * s, 3, th, wp), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )

    def fn(rgb_p: jax.Array) -> jax.Array:
        # rows: 2 edge rows up (EASU tap + RCAS reach), edge fill below;
        # cols: CL edge left, edge fill right (rolled-in lanes never reach
        # the [CL, CL+W) slice)
        xp = jnp.pad(
            rgb_p,
            ((0, 0), (2, rows_p - in_h - 2), (CL, wp - in_w - CL)),
            mode="edge",
        )
        out = call(xp, xp)
        return out[:, :, :in_h, CL : CL + in_w]

    return fn


@functools.lru_cache(maxsize=32)
def make_fsr_phase_kernel_batched(
    n: int, in_h: int, in_w: int, scale: int, sharp: float, th: int = TH
):
    """Batched variant: ``f32 [N, 3, H, W] → u8 [N, s², 3, H, W]`` in one
    pallas_call with a leading batch grid dim."""
    s = scale
    nb = -(-in_h // th)
    rows_p = (nb + 1) * th
    wp = -(-(in_w + CL + 3) // 128) * 128
    interpret = jax.default_backend() == "cpu"

    call = pl.pallas_call(
        _make_kernel(s, sharp, th, wp, in_h, in_w, batched=True),
        out_shape=jax.ShapeDtypeStruct((n, s * s, 3, nb * th, wp), jnp.uint8),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, 3, th, wp), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, th, wp), lambda b, i: (b, 0, i + 1, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, s * s, 3, th, wp), lambda b, i: (b, 0, 0, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )

    def fn(rgb_p: jax.Array) -> jax.Array:
        xp = jnp.pad(
            rgb_p,
            ((0, 0), (0, 0), (2, rows_p - in_h - 2), (CL, wp - in_w - CL)),
            mode="edge",
        )
        out = call(xp, xp)
        return out[:, :, :, :in_h, CL : CL + in_w]

    return fn


def fsr_phase_available() -> bool:
    return True
