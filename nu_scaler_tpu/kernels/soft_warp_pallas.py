"""Pallas TPU kernel: overlapped-tile (soft) motion-compensated warp/blend.

The XLA soft warp (`ops/interpolate._soft_warp_accumulate`) removes block
seams by bilinearly blending per-tile candidate warps — but it pays K=8
candidate slabs × 2 frames of full-image bf16 accumulator read-modify-writes
in HBM (~2.5 ms/pair at 1080p — the r2 flow_soft overhead this kernel
removed; the r3 ladder then took the fused step to 4.23 ms / 473 out-fps).

This kernel restructures the same math around the bilinear blend's locality:
on the HALF-TILE-OFFSET cell grid, a pixel's blend only mixes the 4
surrounding tile centers, so per cell at most 4 candidate slabs per frame
carry weight — the K-term accumulation collapses into VMEM:

  out(p) = Σ_f w_f Σ_k [k active at a corner] w_k(p) · bilerp(slab_{f,k}, p)
  w_k(p) = Σ_{c ∈ 4 corners} [assign_c == k] · bw_c(p),  w_A = 1−t, w_B = t

Mosaic constraint that shaped the design: dynamic HBM slices must be
tile-aligned (8 sublanes × 128 lanes) — arbitrary per-candidate offsets
can't be DMA'd directly (a round-2 per-tile-DMA warp kernel hit exactly
this: it only ever compiled in CPU interpret mode, never Mosaic, and was
deleted as a measured dead end in round 4). So the candidate
slabs are extracted ONCE in XLA (K dynamic_slices per frame, u8, pre-shifted
onto the cell grid) into a stack whose per-cell windows sit at statically
aligned offsets (row cy·th, lane cx·tw·4); the kernel then DMAs only the
slabs whose candidate is assigned to one of its cell's corners (`pl.when` on
scalar compares — smooth-motion cells copy 1 slab per frame, not K), and
accumulates in VMEM with exact per-pixel column lerps (no P/Q lane-shift
approximation).

Candidate selection (global top-K over tile-offset histogram + nearest-
candidate assignment) matches the XLA soft path exactly; the subpixel
fraction is clip(smooth(p) − cand_k, 0, 1) against the bilinearly smoothed
motion field, as there.

Reference lineage: overlapped-block MC de-blocks the block matcher the
reference shipped CPU-side (`Nu_scale/src/upscale/fsr3.rs:319-376`,
`interpolation/mod.rs` BlockMatchingInterpolator).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 4  # RGBA interleaved in the lane dim


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


def hist_topk(q: jax.Array, side: int, k: int) -> jax.Array:
    """Top-K bins of the 2-D integer-offset histogram, scatter- and
    sort-free. `q` is the floored [Ty, Tx, 2] (x, y) offset field already
    shifted to 0..side-1 bin coordinates.

    Semantically identical to
    ``top_k(zeros(side²).at[ids].add(1), k)[1]`` (descending count, ties →
    ascending bin index) but built from TPU-friendly primitives: the
    histogram is an MXU matmul of the two one-hot factors (scatter-add
    measured ~0.5 ms/frame at 1080p on v5e), and the top-k is k chained
    argmaxes (lax.top_k lowers to a ~10k-element sort, similar cost).
    jnp.argmax returns the FIRST maximal index, matching top_k's tie order.
    """
    qx = q[..., 0].reshape(-1)
    qy = q[..., 1].reshape(-1)
    n = qx.shape[0]
    bins = jax.lax.broadcasted_iota(jnp.int32, (side, n), 0)
    oh_y = (bins == qy[None, :]).astype(jnp.float32)  # [side, n]
    oh_x = (bins == qx[None, :]).astype(jnp.float32)
    # hist2d[i, j] = #tiles with (qy == i) & (qx == j); f32 counts are exact
    hist = jnp.dot(
        oh_y, oh_x.T, preferred_element_type=jnp.float32
    ).reshape(-1)  # flat index i * side + j == the scatter version's ids
    flat_bins = jax.lax.broadcasted_iota(jnp.int32, (1, side * side), 1)[0]
    tops = []
    for _ in range(k):
        t = jnp.argmax(hist).astype(jnp.int32)
        tops.append(t)
        hist = jnp.where(flat_bins == t, -1.0, hist)
    return jnp.stack(tops)


def _candidates(tiles: jax.Array, k: int, rng: int):
    """Global top-K integer offsets + per-tile nearest assignment — the same
    selection as ops/interpolate._soft_warp_accumulate."""
    q = jnp.floor(tiles).astype(jnp.int32)
    side = 2 * rng + 2
    top = hist_topk(q + rng, side, k)
    cand_y = top // side - rng
    cand_x = top % side - rng
    d2 = (q[..., 1, None] - cand_y) ** 2 + (q[..., 0, None] - cand_x) ** 2
    assign = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    return cand_y, cand_x, assign


def _kernel(
    # scalar prefetch: per frame FLAT tile arrays (assign/sy/sx [Ty*Tx]) +
    # cand_y/x [K]; then t. Flat 1-D SMEM arrays: the [Cy,Cx,4] corner-stack
    # form blew the 1 MB SMEM budget through multi-dim padding (measured:
    # operand 0 alone padded 139 KB -> 1.09 MB).
    idx_a, sy_a, sx_a, cy_a, cx_a, idx_b, sy_b, sx_b, cy_b, cx_b, t_ref,
    # input: slab stack [2K, RS, CS] u8 (HBM)
    stack_hbm,
    # output
    out_ref,
    # scratch
    *scratch,
    th, tw, k, ty, tx,
):
    slabs = scratch[:1]
    acc = scratch[1]
    sems = scratch[2:]
    ci = pl.program_id(0)
    cj = pl.program_id(1)
    wl = tw * LANES

    def corner_ix(dy, dx):
        # tile index of cell corner (dy,dx) in {0,1}^2, edge-clamped, flat
        ti = jnp.clip(ci - 1 + dy, 0, ty - 1)
        tj = jnp.clip(cj - 1 + dx, 0, tx - 1)
        return ti * tx + tj

    corner = [corner_ix(0, 0), corner_ix(0, 1), corner_ix(1, 0), corner_ix(1, 1)]

    ly = jax.lax.broadcasted_iota(jnp.int32, (th, wl), 0).astype(jnp.float32)
    lx = (jax.lax.broadcasted_iota(jnp.int32, (th, wl), 1) // LANES).astype(
        jnp.float32
    )
    fy = (ly + 0.5) * (1.0 / th)
    fx = (lx + 0.5) * (1.0 / tw)
    basis = (
        (1.0 - fy) * (1.0 - fx),
        (1.0 - fy) * fx,
        fy * (1.0 - fx),
        fy * fx,
    )

    acc[...] = jnp.zeros_like(acc)

    for f, (idx, sy, sx, cnd_y, cnd_x, wgt) in enumerate((
        (idx_a, sy_a, sx_a, cy_a, cx_a, 1.0 - t_ref[0]),
        (idx_b, sy_b, sx_b, cy_b, cx_b, t_ref[0]),
    )):
        corner_idx = [idx[corner[c]] for c in range(4)]
        sm_y = (
            (1.0 - fy) * ((1.0 - fx) * sy[corner[0]] + fx * sy[corner[1]])
            + fy * ((1.0 - fx) * sy[corner[2]] + fx * sy[corner[3]])
        )
        sm_x = (
            (1.0 - fy) * ((1.0 - fx) * sx[corner[0]] + fx * sx[corner[1]])
            + fy * ((1.0 - fx) * sx[corner[2]] + fx * sx[corner[3]])
        )

        # Per-candidate conditional accumulation — the best-measured form on
        # this backend (tools/experiments soft_warp ladder, /tmp/softwarp*):
        # one slab buffer, copy->wait->compute inside pl.when per active
        # candidate. Variants measured SLOWER at 1080p: start-all-then-wait
        # DMA overlap (+0.1 ms), a uniform-cell fast path (+0.35 — extra
        # branches dominate), and branchless per-corner dynamic-index DMAs
        # with bf16 math (+2.4 — 8 unconditional DMAs/cell lose to skipping
        # inactive candidates).
        for kk in range(k):
            flags = [corner_idx[c] == kk for c in range(4)]
            active = jnp.logical_or(
                jnp.logical_or(flags[0], flags[1]),
                jnp.logical_or(flags[2], flags[3]),
            )

            @pl.when(active)
            def _(kk=kk, flags=flags, sm_y=sm_y, sm_x=sm_x,
                  cnd_y=cnd_y, cnd_x=cnd_x, wgt=wgt, f=f):
                cp = pltpu.make_async_copy(
                    stack_hbm.at[
                        f * k + kk,
                        pl.ds(ci * th, th + 8),
                        pl.ds(cj * wl, wl + 128),
                    ],
                    slabs[0],
                    sems[0],
                )
                cp.start()
                w_k = jnp.where(flags[0], basis[0], 0.0)
                for c in range(1, 4):
                    w_k = w_k + jnp.where(flags[c], basis[c], 0.0)
                fyk = jnp.clip(sm_y - cnd_y[kk].astype(jnp.float32), 0.0, 1.0)
                fxk = jnp.clip(sm_x - cnd_x[kk].astype(jnp.float32), 0.0, 1.0)
                cp.wait()
                sl = slabs[0][:].astype(jnp.int32).astype(jnp.float32)
                top = sl[:th, :wl] + fxk * (
                    sl[:th, LANES : wl + LANES] - sl[:th, :wl]
                )
                bot = sl[1 : th + 1, :wl] + fxk * (
                    sl[1 : th + 1, LANES : wl + LANES] - sl[1 : th + 1, :wl]
                )
                acc[...] += (wgt * w_k) * (top + fyk * (bot - top))

    out_ref[...] = (
        jnp.round(jnp.clip(acc[...], 0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)
    )


def _kernel_strip(
    # scalar prefetch: per frame FLAT tile arrays + cand offsets; t; then
    # per-cell-row candidate-activity flags [Cy*2K] (computed in XLA from
    # the corner-assignment field — the kernel DMAs only slabs active
    # somewhere in its row).
    idx_a, sy_a, sx_a, cy_a, cx_a, idx_b, sy_b, sx_b, cy_b, cx_b, t_ref,
    act_ref,
    # input: slab stack [2K, RS, CS] u8 (HBM)
    stack_hbm,
    # output: one ROW of cells per grid step [th, Cx·tw·LANES]
    out_ref,
    # scratch
    slab, acc, smy, smx, sem,
    th, tw, k, ty, tx,
):
    """Row-strip variant of `_kernel`: grid (Cy,) instead of (Cy, Cx).

    v3 issued ≤2K conditional 133 KB DMAs per cell row, each a serialized
    start→wait chain — still ~540 latency-bound round trips at 1080p. v4
    copies the WHOLE stack's row window in ONE strided DMA per row
    ([2K, th+8, CS] ≈ 2.1 MB) and double-buffers it across grid steps, so
    row ci+1's copy overlaps row ci's compute: the kernel pays bandwidth
    (~290 MB/pair ≈ 0.36 ms at v5e HBM) instead of per-slab latency. The
    activity flags now gate only the per-candidate VPU work. Per-cell math
    (and the golden) unchanged from v2.
    """
    ci = pl.program_id(0)
    n_rows = pl.num_programs(0)
    parity = jax.lax.rem(ci, 2)
    cx_cells = tx + 1
    wl = tw * LANES

    def stack_dma(slot, row):
        return pltpu.make_async_copy(
            stack_hbm.at[:, pl.ds(row * th, th + 8), :],
            slab.at[slot],
            sem.at[slot],
        )

    @pl.when(ci == 0)
    def _():
        stack_dma(0, 0).start()

    @pl.when(ci + 1 < n_rows)
    def _():
        stack_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

    stack_dma(parity, ci).wait()

    def corner_ix(dy, dx, j):
        ti = jnp.clip(ci - 1 + dy, 0, ty - 1)
        tj = min(max(j - 1 + dx, 0), tx - 1)  # j is a Python int
        return ti * tx + tj

    ly = jax.lax.broadcasted_iota(jnp.int32, (th, wl), 0).astype(jnp.float32)
    lx = (jax.lax.broadcasted_iota(jnp.int32, (th, wl), 1) // LANES).astype(
        jnp.float32
    )
    fy = (ly + 0.5) * (1.0 / th)
    fx = (lx + 0.5) * (1.0 / tw)
    basis = (
        (1.0 - fy) * (1.0 - fx),
        (1.0 - fy) * fx,
        fy * (1.0 - fx),
        fy * fx,
    )

    acc[...] = jnp.zeros_like(acc)

    for f, (idx, sy, sx, cnd_y, cnd_x, wgt) in enumerate((
        (idx_a, sy_a, sx_a, cy_a, cx_a, 1.0 - t_ref[0]),
        (idx_b, sy_b, sx_b, cy_b, cx_b, t_ref[0]),
    )):
        # smooth motion fields for every cell of the row, once per frame
        for j in range(cx_cells):
            corner = [corner_ix(0, 0, j), corner_ix(0, 1, j),
                      corner_ix(1, 0, j), corner_ix(1, 1, j)]
            smy[:, j * wl : (j + 1) * wl] = (
                (1.0 - fy) * ((1.0 - fx) * sy[corner[0]] + fx * sy[corner[1]])
                + fy * ((1.0 - fx) * sy[corner[2]] + fx * sy[corner[3]])
            )
            smx[:, j * wl : (j + 1) * wl] = (
                (1.0 - fy) * ((1.0 - fx) * sx[corner[0]] + fx * sx[corner[1]])
                + fy * ((1.0 - fx) * sx[corner[2]] + fx * sx[corner[3]])
            )

        for kk in range(k):
            row_active = act_ref[ci * 2 * k + f * k + kk] > 0

            for j in range(cx_cells):
                corner = [corner_ix(0, 0, j), corner_ix(0, 1, j),
                          corner_ix(1, 0, j), corner_ix(1, 1, j)]
                corner_idx = [idx[corner[c]] for c in range(4)]
                flags = [corner_idx[c] == kk for c in range(4)]
                active = jnp.logical_and(
                    row_active,
                    jnp.logical_or(
                        jnp.logical_or(flags[0], flags[1]),
                        jnp.logical_or(flags[2], flags[3]),
                    ),
                )

                @pl.when(active)
                def _(kk=kk, f=f, j=j, flags=flags, cnd_y=cnd_y, cnd_x=cnd_x,
                      wgt=wgt):
                    w_k = jnp.where(flags[0], basis[0], 0.0)
                    for c in range(1, 4):
                        w_k = w_k + jnp.where(flags[c], basis[c], 0.0)
                    cw = slice(j * wl, (j + 1) * wl)
                    fyk = jnp.clip(
                        smy[:, cw] - cnd_y[kk].astype(jnp.float32), 0.0, 1.0
                    )
                    fxk = jnp.clip(
                        smx[:, cw] - cnd_x[kk].astype(jnp.float32), 0.0, 1.0
                    )
                    sl = slab[
                        parity, f * k + kk, :, j * wl : (j + 1) * wl + 2 * LANES
                    ].astype(jnp.int32).astype(jnp.float32)
                    top = sl[:th, :wl] + fxk * (
                        sl[:th, LANES : wl + LANES] - sl[:th, :wl]
                    )
                    bot = sl[1 : th + 1, :wl] + fxk * (
                        sl[1 : th + 1, LANES : wl + LANES] - sl[1 : th + 1, :wl]
                    )
                    acc[:, cw] += (wgt * w_k) * (top + fyk * (bot - top))

    out_ref[...] = (
        jnp.round(jnp.clip(acc[...], 0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)
    )


def _kernel_strip_v5(
    idx_a, sy_a, sx_a, cy_a, cx_a, idx_b, sy_b, sx_b, cy_b, cx_b, t_ref,
    act_ref,
    stack_hbm,
    out_ref,
    slab, acc, sem,
    th, tw, k, ty, tx,
):
    """v5 of the row-strip kernel — same math, restructured control flow.

    v4 measured 1.94 ms/pair at 1080p with its compute, not DMA, dominant:
    per row it evaluated 2·K·(Tx+1) = 256 `pl.when` predicates (4 SMEM reads
    + compares each) and copied the WHOLE 2K-slab row window (290 MB/pair)
    regardless of activity. v5 exploits two facts:

    * dynamic LEADING-axis indexing of VMEM scratch is legal on Mosaic (v4
      already indexes `slab[parity]` with a grid-derived value) — so each
      cell reads its ≤4 corner slabs directly via the corner ASSIGNMENT
      (`slab[parity·2K + f·K + idx[corner]]`), replacing the K-candidate
      branch ladder with at most 2 branches per cell (uniform-corner fast
      path / 4-corner general path);
    * the per-row activity flags can gate the slab DMAs themselves (smooth
      motion copies ~2 slabs/row, not 2K) — the flags are exact: a cell only
      dereferences candidates its corner tiles assign to, which is how
      `row_hit` is built.

    Fraction lookups (`cand_y[kidx]`) are dynamic SMEM reads — also legal
    (scalar memory). DMA offsets stay grid-affine (`row·th`), satisfying the
    backend's static-offset constraint (CLAUDE.md).
    """
    ci = pl.program_id(0)
    n_rows = pl.num_programs(0)
    parity = jax.lax.rem(ci, 2)
    cx_cells = tx + 1
    wl = tw * LANES
    k2 = 2 * k

    def slab_dma(slot, row, sl):
        return pltpu.make_async_copy(
            stack_hbm.at[sl, pl.ds(row * th, th + 8), :],
            slab.at[slot * k2 + sl],
            sem.at[slot * k2 + sl],
        )

    def start_row(slot, row):
        for sl in range(k2):
            @pl.when(act_ref[row * k2 + sl] > 0)
            def _(sl=sl):
                slab_dma(slot, row, sl).start()

    def wait_row(slot, row):
        for sl in range(k2):
            @pl.when(act_ref[row * k2 + sl] > 0)
            def _(sl=sl):
                slab_dma(slot, row, sl).wait()

    @pl.when(ci == 0)
    def _():
        start_row(0, 0)

    @pl.when(ci + 1 < n_rows)
    def _():
        start_row(jax.lax.rem(ci + 1, 2), ci + 1)

    wait_row(parity, ci)

    def corner_ix(dy, dx, j):
        ti = jnp.clip(ci - 1 + dy, 0, ty - 1)
        tj = min(max(j - 1 + dx, 0), tx - 1)  # j is a Python int
        return ti * tx + tj

    ly = jax.lax.broadcasted_iota(jnp.int32, (th, wl), 0).astype(jnp.float32)
    lx = (jax.lax.broadcasted_iota(jnp.int32, (th, wl), 1) // LANES).astype(
        jnp.float32
    )
    fy = (ly + 0.5) * (1.0 / th)
    fx = (lx + 0.5) * (1.0 / tw)
    basis = (
        (1.0 - fy) * (1.0 - fx),
        (1.0 - fy) * fx,
        fy * (1.0 - fx),
        fy * fx,
    )

    acc[...] = jnp.zeros_like(acc)

    for f, (idx, sy, sx, cnd_y, cnd_x, wgt) in enumerate((
        (idx_a, sy_a, sx_a, cy_a, cx_a, 1.0 - t_ref[0]),
        (idx_b, sy_b, sx_b, cy_b, cx_b, t_ref[0]),
    )):
        for j in range(cx_cells):
            corner = [corner_ix(0, 0, j), corner_ix(0, 1, j),
                      corner_ix(1, 0, j), corner_ix(1, 1, j)]
            cidx = [idx[corner[c]] for c in range(4)]
            sm_y = (
                (1.0 - fy) * ((1.0 - fx) * sy[corner[0]] + fx * sy[corner[1]])
                + fy * ((1.0 - fx) * sy[corner[2]] + fx * sy[corner[3]])
            )
            sm_x = (
                (1.0 - fy) * ((1.0 - fx) * sx[corner[0]] + fx * sx[corner[1]])
                + fy * ((1.0 - fx) * sx[corner[2]] + fx * sx[corner[3]])
            )
            cw = slice(j * wl, (j + 1) * wl)

            def sample(kidx, j=j, sm_y=sm_y, sm_x=sm_x, f=f, cnd_y=cnd_y,
                       cnd_x=cnd_x):
                """Bilinear sample of candidate kidx's slab over this cell
                (register value [th, wl])."""
                fyk = jnp.clip(sm_y - cnd_y[kidx].astype(jnp.float32), 0.0, 1.0)
                fxk = jnp.clip(sm_x - cnd_x[kidx].astype(jnp.float32), 0.0, 1.0)
                sl = slab[
                    parity * k2 + f * k + kidx, :,
                    j * wl : (j + 1) * wl + 2 * LANES,
                ].astype(jnp.int32).astype(jnp.float32)
                top = sl[:th, :wl] + fxk * (
                    sl[:th, LANES : wl + LANES] - sl[:th, :wl]
                )
                bot = sl[1 : th + 1, :wl] + fxk * (
                    sl[1 : th + 1, LANES : wl + LANES] - sl[1 : th + 1, :wl]
                )
                return top + fyk * (bot - top)

            same = jnp.logical_and(
                jnp.logical_and(cidx[0] == cidx[1], cidx[0] == cidx[2]),
                cidx[0] == cidx[3],
            )

            @pl.when(same)
            def _(cidx=cidx, cw=cw, wgt=wgt, sample=sample):
                # all four corners agree → Σ_c basis_c = 1 exactly
                acc[:, cw] += wgt * sample(cidx[0])

            @pl.when(jnp.logical_not(same))
            def _(cidx=cidx, cw=cw, wgt=wgt, sample=sample):
                v = basis[0] * sample(cidx[0])
                for c in range(1, 4):
                    v += basis[c] * sample(cidx[c])
                acc[:, cw] += wgt * v

    out_ref[...] = (
        jnp.round(jnp.clip(acc[...], 0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)
    )


def _kernel_strip_v6(
    idx_a, sy_a, sx_a, cy_a, cx_a, idx_b, sy_b, sx_b, cy_b, cx_b, t_ref,
    act_ref,
    stack_hbm,
    out_ref,
    slab, acc, sem,
    th, tw, k, ty, tx, s_rows,
):
    """v6: v5's per-cell math over STRIPS of `s_rows` cell rows per grid
    step. v5 measured ~10 µs/row at 1080p on smooth motion — 5× its VPU
    compute — i.e. per-grid-step fixed cost (DMA issue latency, branch
    scalar evaluation, step turnaround) dominated. One step now covers
    s_rows rows: slab DMAs are s_rows× taller (one issue), the activity
    flags are pre-ORed over the strip in XLA, and the per-step overhead
    amortizes across 4× the pixels. Math and golden unchanged.
    """
    gi = pl.program_id(0)
    n_strips = pl.num_programs(0)
    parity = jax.lax.rem(gi, 2)
    cx_cells = tx + 1
    wl = tw * LANES
    k2 = 2 * k
    srows_px = s_rows * th

    def slab_dma(slot, strip, sl):
        return pltpu.make_async_copy(
            stack_hbm.at[sl, pl.ds(strip * srows_px, srows_px + 8), :],
            slab.at[slot * k2 + sl],
            sem.at[slot * k2 + sl],
        )

    def start_strip(slot, strip):
        for sl in range(k2):
            @pl.when(act_ref[strip * k2 + sl] > 0)
            def _(sl=sl):
                slab_dma(slot, strip, sl).start()

    def wait_strip(slot, strip):
        for sl in range(k2):
            @pl.when(act_ref[strip * k2 + sl] > 0)
            def _(sl=sl):
                slab_dma(slot, strip, sl).wait()

    @pl.when(gi == 0)
    def _():
        start_strip(0, 0)

    @pl.when(gi + 1 < n_strips)
    def _():
        start_strip(jax.lax.rem(gi + 1, 2), gi + 1)

    wait_strip(parity, gi)

    ly = jax.lax.broadcasted_iota(jnp.int32, (th, wl), 0).astype(jnp.float32)
    lx = (jax.lax.broadcasted_iota(jnp.int32, (th, wl), 1) // LANES).astype(
        jnp.float32
    )
    fy = (ly + 0.5) * (1.0 / th)
    fx = (lx + 0.5) * (1.0 / tw)
    basis = (
        (1.0 - fy) * (1.0 - fx),
        (1.0 - fy) * fx,
        fy * (1.0 - fx),
        fy * fx,
    )

    acc[...] = jnp.zeros_like(acc)

    for s in range(s_rows):
        ci = gi * s_rows + s
        rw = slice(s * th, (s + 1) * th)

        def corner_ix(dy, dx, j, ci=ci):
            ti = jnp.clip(ci - 1 + dy, 0, ty - 1)
            tj = min(max(j - 1 + dx, 0), tx - 1)  # j is a Python int
            return ti * tx + tj

        for f, (idx, sy, sx, cnd_y, cnd_x, wgt) in enumerate((
            (idx_a, sy_a, sx_a, cy_a, cx_a, 1.0 - t_ref[0]),
            (idx_b, sy_b, sx_b, cy_b, cx_b, t_ref[0]),
        )):
            for j in range(cx_cells):
                corner = [corner_ix(0, 0, j), corner_ix(0, 1, j),
                          corner_ix(1, 0, j), corner_ix(1, 1, j)]
                cidx = [idx[corner[c]] for c in range(4)]
                sm_y = (
                    (1.0 - fy) * ((1.0 - fx) * sy[corner[0]] + fx * sy[corner[1]])
                    + fy * ((1.0 - fx) * sy[corner[2]] + fx * sy[corner[3]])
                )
                sm_x = (
                    (1.0 - fy) * ((1.0 - fx) * sx[corner[0]] + fx * sx[corner[1]])
                    + fy * ((1.0 - fx) * sx[corner[2]] + fx * sx[corner[3]])
                )
                cw = slice(j * wl, (j + 1) * wl)

                def sample(kidx, s=s, j=j, sm_y=sm_y, sm_x=sm_x, f=f,
                           cnd_y=cnd_y, cnd_x=cnd_x):
                    fyk = jnp.clip(
                        sm_y - cnd_y[kidx].astype(jnp.float32), 0.0, 1.0
                    )
                    fxk = jnp.clip(
                        sm_x - cnd_x[kidx].astype(jnp.float32), 0.0, 1.0
                    )
                    sl = slab[
                        parity * k2 + f * k + kidx,
                        s * th : (s + 1) * th + 1,
                        j * wl : (j + 1) * wl + 2 * LANES,
                    ].astype(jnp.int32).astype(jnp.float32)
                    top = sl[:th, :wl] + fxk * (
                        sl[:th, LANES : wl + LANES] - sl[:th, :wl]
                    )
                    bot = sl[1 : th + 1, :wl] + fxk * (
                        sl[1 : th + 1, LANES : wl + LANES] - sl[1 : th + 1, :wl]
                    )
                    return top + fyk * (bot - top)

                same = jnp.logical_and(
                    jnp.logical_and(cidx[0] == cidx[1], cidx[0] == cidx[2]),
                    cidx[0] == cidx[3],
                )

                @pl.when(same)
                def _(cidx=cidx, cw=cw, rw=rw, wgt=wgt, sample=sample):
                    acc[rw, cw] += wgt * sample(cidx[0])

                @pl.when(jnp.logical_not(same))
                def _(cidx=cidx, cw=cw, rw=rw, wgt=wgt, sample=sample):
                    v = basis[0] * sample(cidx[0])
                    for c in range(1, 4):
                        v += basis[c] * sample(cidx[c])
                    acc[rw, cw] += wgt * v

    out_ref[...] = (
        jnp.round(jnp.clip(acc[...], 0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)
    )


def _kernel_strip_v7(
    idx_a, sy_a, sx_a, cy_a, cx_a, idx_b, sy_b, sx_b, cy_b, cx_b, t_ref,
    act_ref,
    stack_hbm,
    out_ref,
    slab, f32a, f32s, acc, sem,
    th, tw, k, ty, tx,
):
    """v7: v5's per-cell math with a per-row slab CONVERSION PASS.

    v5/v6 measured VPU-compute-bound: every cell's sample() converted its
    own u8 window (u8→i32→f32, the Mosaic cast hop) and read a +1-px
    MISALIGNED column slice — 32 small relayout-heavy ops per row. v7
    converts each ACTIVE slab's row window to f32 once per grid row into
    two aligned buffers (`f32a` = the window, `f32s` = the window shifted
    one pixel left, giving x+1 samples at aligned offsets); per-cell
    samples then reduce to clips + aligned f32 lerps. The strip-of-4 v6
    experiment showed per-step overhead is NOT the bottleneck (−3% only),
    so v7 returns to one cell row per grid step, spending VMEM on the f32
    buffers instead ([2K, th+1, Cx·tw·4] × 2 — k ≤ 6 at 1080p). Math and
    golden unchanged: the f32 lerp identity a+(f)·(s−a) with s = a(x+1) is
    exactly v5's form.
    """
    ci = pl.program_id(0)
    n_rows = pl.num_programs(0)
    parity = jax.lax.rem(ci, 2)
    cx_cells = tx + 1
    wl = tw * LANES
    k2 = 2 * k
    csf = cx_cells * wl

    def slab_dma(slot, row, sl):
        return pltpu.make_async_copy(
            stack_hbm.at[sl, pl.ds(row * th, th + 8), :],
            slab.at[slot * k2 + sl],
            sem.at[slot * k2 + sl],
        )

    def start_row(slot, row):
        for sl in range(k2):
            @pl.when(act_ref[row * k2 + sl] > 0)
            def _(sl=sl):
                slab_dma(slot, row, sl).start()

    @pl.when(ci == 0)
    def _():
        start_row(0, 0)

    @pl.when(ci + 1 < n_rows)
    def _():
        start_row(jax.lax.rem(ci + 1, 2), ci + 1)

    for sl in range(k2):
        @pl.when(act_ref[ci * k2 + sl] > 0)
        def _(sl=sl):
            slab_dma(parity, ci, sl).wait()
            win = slab[parity * k2 + sl]
            f32a[sl] = win[: th + 1, :csf].astype(jnp.int32).astype(jnp.float32)
            f32s[sl] = win[: th + 1, LANES : csf + LANES].astype(
                jnp.int32
            ).astype(jnp.float32)

    ly = jax.lax.broadcasted_iota(jnp.int32, (th, wl), 0).astype(jnp.float32)
    lx = (jax.lax.broadcasted_iota(jnp.int32, (th, wl), 1) // LANES).astype(
        jnp.float32
    )
    fy = (ly + 0.5) * (1.0 / th)
    fx = (lx + 0.5) * (1.0 / tw)
    basis = (
        (1.0 - fy) * (1.0 - fx),
        (1.0 - fy) * fx,
        fy * (1.0 - fx),
        fy * fx,
    )

    acc[...] = jnp.zeros_like(acc)

    def corner_ix(dy, dx, j):
        ti = jnp.clip(ci - 1 + dy, 0, ty - 1)
        tj = min(max(j - 1 + dx, 0), tx - 1)  # j is a Python int
        return ti * tx + tj

    for f, (idx, sy, sx, cnd_y, cnd_x, wgt) in enumerate((
        (idx_a, sy_a, sx_a, cy_a, cx_a, 1.0 - t_ref[0]),
        (idx_b, sy_b, sx_b, cy_b, cx_b, t_ref[0]),
    )):
        for j in range(cx_cells):
            corner = [corner_ix(0, 0, j), corner_ix(0, 1, j),
                      corner_ix(1, 0, j), corner_ix(1, 1, j)]
            cidx = [idx[corner[c]] for c in range(4)]
            sm_y = (
                (1.0 - fy) * ((1.0 - fx) * sy[corner[0]] + fx * sy[corner[1]])
                + fy * ((1.0 - fx) * sy[corner[2]] + fx * sy[corner[3]])
            )
            sm_x = (
                (1.0 - fy) * ((1.0 - fx) * sx[corner[0]] + fx * sx[corner[1]])
                + fy * ((1.0 - fx) * sx[corner[2]] + fx * sx[corner[3]])
            )
            cw = slice(j * wl, (j + 1) * wl)

            def sample(kidx, j=j, sm_y=sm_y, sm_x=sm_x, f=f, cnd_y=cnd_y,
                       cnd_x=cnd_x):
                fyk = jnp.clip(sm_y - cnd_y[kidx].astype(jnp.float32), 0.0, 1.0)
                fxk = jnp.clip(sm_x - cnd_x[kidx].astype(jnp.float32), 0.0, 1.0)
                si = f * k + kidx
                a_t = f32a[si, :th, cw]
                s_t = f32s[si, :th, cw]
                a_b = f32a[si, 1 : th + 1, cw]
                s_b = f32s[si, 1 : th + 1, cw]
                top = a_t + fxk * (s_t - a_t)
                bot = a_b + fxk * (s_b - a_b)
                return top + fyk * (bot - top)

            same = jnp.logical_and(
                jnp.logical_and(cidx[0] == cidx[1], cidx[0] == cidx[2]),
                cidx[0] == cidx[3],
            )

            @pl.when(same)
            def _(cidx=cidx, cw=cw, wgt=wgt, sample=sample):
                acc[:, cw] += wgt * sample(cidx[0])

            @pl.when(jnp.logical_not(same))
            def _(cidx=cidx, cw=cw, wgt=wgt, sample=sample):
                v = basis[0] * sample(cidx[0])
                for c in range(1, 4):
                    v += basis[c] * sample(cidx[c])
                acc[:, cw] += wgt * v

    out_ref[...] = (
        jnp.round(jnp.clip(acc[...], 0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)
    )


@functools.lru_cache(maxsize=16)
def _build(h: int, w: int, th: int, tw: int, rng: int, k: int,
           strip: bool = True, v5: bool = True, strip_rows: int = 4):
    ty, tx = h // th, w // tw
    cy, cx = ty + 1, tx + 1
    hh, hw = th // 2, tw // 2
    pad_y = rng + hh + 2
    pad_x = rng + hw + 2
    cs = (cx * tw + 32) * LANES  # +32 px: the 128-lane halo block
    csf = cx * tw * LANES
    # v7 (per-row f32 conversion pass) when its buffers fit VMEM (~16 MB,
    # leave headroom): u8 slabs + two f32 window stacks + accumulator
    v7_bytes = (
        2 * 2 * k * (th + 8) * cs
        + 2 * (2 * k * (th + 1) * csf * 4)
        + th * csf * 4
    )
    use_v7 = strip and v5 and v7_bytes <= 12 * 2**20
    s_rows = 1 if use_v7 else max(1, min(strip_rows, cy))
    n_strips = -(-cy // s_rows)  # ceil; trailing rows masked by slicing
    rs = n_strips * s_rows * th + 16  # slab-stack rows (+16: 8-aligned halo)

    if use_v7:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=12,
            grid=(cy,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # slab stack (HBM)
            out_specs=pl.BlockSpec(
                (th, cx * tw * LANES), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * 2 * k, th + 8, cs), jnp.uint8),
                pltpu.VMEM((2 * k, th + 1, csf), jnp.float32),  # f32a
                pltpu.VMEM((2 * k, th + 1, csf), jnp.float32),  # f32s (x+1)
                pltpu.VMEM((th, csf), jnp.float32),  # acc
                pltpu.SemaphoreType.DMA((2 * 2 * k,)),
            ],
        )
        call = pl.pallas_call(
            functools.partial(_kernel_strip_v7, th=th, tw=tw, k=k, ty=ty, tx=tx),
            out_shape=jax.ShapeDtypeStruct((cy * th, cx * tw * LANES), jnp.uint8),
            grid_spec=grid_spec,
            interpret=jax.default_backend() == "cpu",
        )
    elif strip and v5 and s_rows > 1:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=12,
            grid=(n_strips,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # slab stack (HBM)
            out_specs=pl.BlockSpec(
                (s_rows * th, cx * tw * LANES), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * 2 * k, s_rows * th + 8, cs), jnp.uint8),
                pltpu.VMEM((s_rows * th, cx * tw * LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2 * 2 * k,)),
            ],
        )
        call = pl.pallas_call(
            functools.partial(
                _kernel_strip_v6, th=th, tw=tw, k=k, ty=ty, tx=tx,
                s_rows=s_rows,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_strips * s_rows * th, cx * tw * LANES), jnp.uint8
            ),
            grid_spec=grid_spec,
            interpret=jax.default_backend() == "cpu",
        )
    elif strip and v5:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=12,
            grid=(cy,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # slab stack (HBM)
            out_specs=pl.BlockSpec(
                (th, cx * tw * LANES), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                # double-buffered per-slab row windows, slot-major FLAT so a
                # cell can index its corner slab dynamically (leading axis)
                pltpu.VMEM((2 * 2 * k, th + 8, cs), jnp.uint8),
                pltpu.VMEM((th, cx * tw * LANES), jnp.float32),  # acc
                pltpu.SemaphoreType.DMA((2 * 2 * k,)),
            ],
        )
        call = pl.pallas_call(
            functools.partial(_kernel_strip_v5, th=th, tw=tw, k=k, ty=ty, tx=tx),
            out_shape=jax.ShapeDtypeStruct((cy * th, cx * tw * LANES), jnp.uint8),
            grid_spec=grid_spec,
            interpret=jax.default_backend() == "cpu",
        )
    elif strip:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=12,
            grid=(cy,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # slab stack (HBM)
            out_specs=pl.BlockSpec(
                (th, cx * tw * LANES), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                # double-buffered whole-stack row window (v4): slot × slab ×
                # rows × lanes; ~2·2K·(th+8)·cs u8 ≈ 4.3 MB at 1080p/(8,128)
                pltpu.VMEM((2, 2 * k, th + 8, cs), jnp.uint8),
                pltpu.VMEM((th, cx * tw * LANES), jnp.float32),  # acc
                pltpu.VMEM((th, cx * tw * LANES), jnp.float32),  # smooth y
                pltpu.VMEM((th, cx * tw * LANES), jnp.float32),  # smooth x
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        call = pl.pallas_call(
            functools.partial(_kernel_strip, th=th, tw=tw, k=k, ty=ty, tx=tx),
            out_shape=jax.ShapeDtypeStruct((cy * th, cx * tw * LANES), jnp.uint8),
            grid_spec=grid_spec,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=11,
            grid=(cy, cx),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # slab stack (HBM)
            out_specs=pl.BlockSpec(
                (th, tw * LANES), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((th + 8, (tw + 32) * LANES), jnp.uint8),
                pltpu.VMEM((th, tw * LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        call = pl.pallas_call(
            functools.partial(_kernel, th=th, tw=tw, k=k, ty=ty, tx=tx),
            out_shape=jax.ShapeDtypeStruct((cy * th, cx * tw * LANES), jnp.uint8),
            grid_spec=grid_spec,
            interpret=jax.default_backend() == "cpu",
        )

    def fn(frame_a, frame_b, flow, time_t, tiles=None):
        t_arr = jnp.asarray([time_t], jnp.float32)
        # full-step A→B tile-mean motion; per-frame fields are scalar
        # multiples of it (tile_mean is linear), so compute it once
        base_tiles = tiles if tiles is not None else _tile_mean(flow, th, tw)

        def frame_inputs(frame, sign):
            tiles = jnp.clip(sign * base_tiles, -rng, rng)
            cand_y, cand_x, assign = _candidates(tiles, k, rng)
            idx = assign.reshape(-1)
            sy = tiles[..., 1].astype(jnp.float32).reshape(-1)
            sx = tiles[..., 0].astype(jnp.float32).reshape(-1)
            # exact-need padding: slab slices start at pad_y−hh+cand_y ∈
            # [2, 2+2rng] and read rs rows (cs/LANES cols) — pad the bottom/
            # right to cover the furthest read, no more. The copies stay in
            # the u8 lane domain: an int32 (packed-RGBA) variant — pad and
            # slice on 4× fewer lanes, bitcast back — measured WORSE
            # end-to-end (fused warp 2.16 → 3.42 ms,
            # soft_warp_i32_extract_bench.py); the u8 lane-offset copy is
            # already the fast lowering here.
            bot_y = 2 + 2 * rng + rs - pad_y - h
            rgt_x = 2 + 2 * rng + cs // LANES - pad_x - w
            padded = jnp.pad(
                frame,
                ((pad_y, bot_y), (pad_x, rgt_x), (0, 0)),
                mode="edge",
            ).reshape(h + pad_y + bot_y, -1)
            slabs = [
                jax.lax.dynamic_slice(
                    padded,
                    (
                        pad_y - hh + cand_y[i],
                        (pad_x - hw + cand_x[i]) * LANES,
                    ),
                    (rs, cs),
                )
                for i in range(k)
            ]
            # per-cell-row candidate activity [Cy, K]: a row's cells touch a
            # candidate iff some corner tile (rows ci-1, ci clamped) assigns
            # to it — lets the strip kernel skip inactive slab DMAs entirely
            asg = assign
            rowpair = jnp.concatenate(
                [asg[:1], asg, asg[-1:]], axis=0
            )  # [ty+2, tx] edge-clamped
            onehot = (rowpair[..., None] == jnp.arange(k)).astype(jnp.int32)
            row_hit = (onehot[:-1].sum(axis=1) + onehot[1:].sum(axis=1))
            return jnp.stack(slabs), idx, sy, sx, cand_y, cand_x, row_hit

        st_a, idx_a, sy_a, sx_a, cya, cxa, act_a = frame_inputs(
            frame_a, -t_arr[0]
        )
        st_b, idx_b, sy_b, sx_b, cyb, cxb, act_b = frame_inputs(
            frame_b, 1.0 - t_arr[0]
        )
        stack = jnp.concatenate([st_a, st_b], axis=0)

        if strip:
            act = jnp.concatenate([act_a, act_b], axis=1)  # [cy, 2K]
            if s_rows > 1:
                # strip-level activity: a slab is DMA'd iff active in ANY
                # cell row of the strip (trailing pad rows contribute 0)
                act = jnp.pad(act, ((0, n_strips * s_rows - cy), (0, 0)))
                act = act.reshape(n_strips, s_rows, 2 * k).max(axis=1)
            act = act.reshape(-1)
            out = call(
                idx_a, sy_a, sx_a, cya, cxa, idx_b, sy_b, sx_b, cyb, cxb,
                t_arr, act, stack,
            )
        else:
            out = call(
                idx_a, sy_a, sx_a, cya, cxa, idx_b, sy_b, sx_b, cyb, cxb,
                t_arr, stack,
            )
        out = out[hh : hh + h, hw * LANES : (hw + w) * LANES]
        return out.reshape(h, w, LANES)

    return fn


def soft_warp_blend(
    frame_a: jax.Array,
    frame_b: jax.Array,
    flow: jax.Array | None,
    time_t,
    tile: tuple = (8, 128),
    rng: int = 48,
    k: int = 8,
    tiles: jax.Array | None = None,
) -> jax.Array:
    """Overlapped-tile MC blend: u8 [H, W, 4] × 2 + dense flow [H, W, 2] →
    u8 [H, W, 4]. H must divide by tile[0] and W by tile[1] (1080p/4K do);
    use `ops.interpolate.warp_blend_fast(overlap=True)` for the general
    entry point (it falls back to the XLA soft path on ragged shapes).

    Either `flow` (dense, tile-averaged here) or `tiles` (precomputed
    [H/th, W/tw, 2] tile-mean motion in full-res pixel units, e.g. from
    `ops.interpolate.flow_tiles_fast`) must be given.

    Alpha is motion-compensated alongside RGB (the XLA path cross-fades it);
    identical for the α≡255 frames the capture path produces.
    """
    h, w = frame_a.shape[:2]
    th, tw = tile
    if h % th or w % tw:
        raise ValueError(f"shape ({h}, {w}) must tile by {tile}")
    if flow is None and tiles is None:
        raise ValueError("need flow or tiles")
    return _build(h, w, th, tw, rng, k)(frame_a, frame_b, flow, time_t,
                                        tiles=tiles)


# ---------------------------------------------------------------------------
# numpy golden (mirrors the kernel math exactly; tests)
# ---------------------------------------------------------------------------


def soft_warp_blend_ref(
    a_u8: np.ndarray, b_u8: np.ndarray, flow: np.ndarray, time_t: float,
    tile: tuple = (8, 128), rng: int = 48, k: int = 8,
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
        side = 2 * rng + 2
        ids = ((q[..., 1] + rng) * side + (q[..., 0] + rng)).reshape(-1)
        hist = np.bincount(ids, minlength=side * side)
        # stable top-k matching lax.top_k (descending value, ascending index)
        top = np.lexsort((np.arange(side * side), -hist))[:k]
        cand_y = top // side - rng
        cand_x = top % side - rng
        d2 = (q[..., 1, None] - cand_y) ** 2 + (q[..., 0, None] - cand_x) ** 2
        assign = np.argmin(d2, axis=-1)
        idx_c = corners(assign)
        sy_c = corners(tiles[..., 1])
        sx_c = corners(tiles[..., 0])
        for cyy in range(ty + 1):
            for cxx in range(tx + 1):
                for lr in range(th):
                    gr = cyy * th - th // 2 + lr
                    if not 0 <= gr < h:
                        continue
                    fyv = (lr + 0.5) / th
                    for lc in range(tw):
                        gc = cxx * tw - tw // 2 + lc
                        if not 0 <= gc < w:
                            continue
                        fxv = (lc + 0.5) / tw
                        bw = (
                            (1 - fyv) * (1 - fxv), (1 - fyv) * fxv,
                            fyv * (1 - fxv), fyv * fxv,
                        )
                        sm_y = (
                            (1 - fyv) * ((1 - fxv) * sy_c[0][cyy, cxx] + fxv * sy_c[1][cyy, cxx])
                            + fyv * ((1 - fxv) * sy_c[2][cyy, cxx] + fxv * sy_c[3][cyy, cxx])
                        )
                        sm_x = (
                            (1 - fyv) * ((1 - fxv) * sx_c[0][cyy, cxx] + fxv * sx_c[1][cyy, cxx])
                            + fyv * ((1 - fxv) * sx_c[2][cyy, cxx] + fxv * sx_c[3][cyy, cxx])
                        )
                        for c in range(4):
                            ki = idx_c[c][cyy, cxx]
                            qy, qx = cand_y[ki], cand_x[ki]
                            fyf = np.clip(sm_y - qy, 0.0, 1.0)
                            fxf = np.clip(sm_x - qx, 0.0, 1.0)
                            ry = pad + gr + qy
                            rx = pad + gc + qx
                            v = (
                                ip[ry, rx] * (1 - fyf) * (1 - fxf)
                                + ip[ry, rx + 1] * (1 - fyf) * fxf
                                + ip[ry + 1, rx] * fyf * (1 - fxf)
                                + ip[ry + 1, rx + 1] * fyf * fxf
                            )
                            out[gr, gc] += wgt * bw[c] * v
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
