"""Pallas TPU kernel: 3×3 SAME conv for the learned tier's trunk shape.

XLA's convolution lowering reaches ~29% of MXU peak at [270, 480, 128]
(tools/experiments/conv_sweep.py). This kernel holds a row-strip slab in VMEM (static
t/t+1 BlockSpecs for the ±1 halo) and runs the conv as 9 accumulating
dot_generals over the 128-lane channel dim — activations in bf16, f32
accumulation, optional fused bias+ReLU.

Layout: [H, W, C] with C(=128) exactly one lane tile; W on sublanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8  # output rows per grid step (th=16 hits the 16 MB scoped-vmem limit
# when composed with neighboring ops; th=8 also measured fastest: 0.196 ms)


def _make_kernel(th: int, w: int, cin: int, cout: int, relu: bool):
    def kernel(w_ref, b_ref, x0_ref, x1_ref, out_ref):
        slab = jnp.concatenate([x0_ref[:], x1_ref[:]], axis=0)  # [2th, w+8, cin]
        acc = None
        for dy in range(3):
            rows = slab[dy : dy + th, :, :]
            for dx in range(3):
                xs = rows[:, dx : dx + w, :]
                t = jax.lax.dot_general(
                    xs,
                    w_ref[dy * 3 + dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
        acc = acc + b_ref[0].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[:] = acc.astype(out_ref.dtype)

    return kernel


@functools.lru_cache(maxsize=32)
def make_conv3x3(
    h: int, w: int, cin: int, cout: int, relu: bool = False, th: int = TH
):
    """Returns ``(x_bf16 [H, W, Cin], k [3,3,Cin,Cout], b [Cout]) → bf16
    [H, W, Cout]`` or None when shapes don't tile (Cin/Cout must be lane
    multiples)."""
    if cin % 128 or cout % 128:
        return None
    nb = -(-h // th)
    hp = nb * th
    wp = w + 8  # 1 left halo col + 7 sublane-alignment pad
    interpret = jax.default_backend() == "cpu"

    call = pl.pallas_call(
        _make_kernel(th, w, cin, cout, relu),
        out_shape=jax.ShapeDtypeStruct((hp, w, cout), jnp.bfloat16),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, wp, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, wp, cin), lambda i: (i + 1, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, w, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    def fn(x: jax.Array, k: jax.Array, b: jax.Array) -> jax.Array:
        # rows: 1 halo row up, fill to (nb+1)·th below; cols: 1 left, 7 right
        xp = jnp.pad(
            x.astype(jnp.bfloat16),
            ((1, (nb + 1) * th - h - 1), (1, 7), (0, 0)),
        )
        kk = k.astype(jnp.bfloat16).reshape(9, cin, cout)
        bb = b.astype(jnp.bfloat16).reshape(1, cout)
        return call(kk, bb, xp, xp)[:h]

    return fn


# ---------------------------------------------------------------------------
# Whole-trunk fusion: the learned tier's entire conv stack in ONE kernel
# ---------------------------------------------------------------------------
#
# Per-layer pallas_calls measured SLOWER than XLA end-to-end (7.51 vs
# 6.58 ms/frame — each call breaks XLA's skip-add fusion and round-trips
# activations through HBM). This kernel instead runs the full ESRGANLiteTPU
# trunk (reference role: the dlss-sys quality tier,
# /root/reference/dlss-sys/src/lib.rs:1-451) for a row strip with every
# intermediate activation resident in VMEM:
#
# MEASURED VERDICT (r3, tools/experiments/conv_stack_probe.py): NOT viable
# on this backend. The full 7-layer kernel needs 64.9 MB scoped vmem at
# th=16 (>16 MB default; raising vmem_limit_bytes clears Mosaic but the
# remote compile helper SIGKILLs on the unrolled graph at every th), and
# plain 2-/3-conv stacks DO compile yet run at 1.07-1.18 ms/conv — 5× the
# single-conv kernel (0.196) and 3× XLA (0.31); routing the intermediate
# through a VMEM scratch ref instead of a value chain changes nothing
# (1.136 ms/conv). The XLA conv chain stays the production serving path;
# this kernel is kept (with its CPU-interpret parity test) as the
# documented dead end.
#
#   feat = conv(head);  repeat blocks: h += 0.2·conv(relu(conv(h)));
#   h = conv(trunk) + feat;  out = conv(tail)
#
# Halo handling: depth D = 3+2·blocks conv layers ⇒ the strip consumes
# th+2D input rows/cols to emit th rows. Rows come from ⌈(th+2D)/th⌉
# consecutive th-row slabs of the padded input (static grid-affine
# BlockSpecs — the only DMA form this backend compiles, CLAUDE.md); each
# layer's window shrinks by 2 so the redundant-halo compute fraction is
# ~2D/th·(avg layer)/… — th=16 keeps it ≈37% while fitting the ~16 MB VMEM.


def _trunk_kernel(th: int, w: int, d: int, blocks: int, fh: int, fw: int):
    def kernel(*refs):
        (wh, bh), rest = refs[0:2], refs[2:]
        blk = [tuple(rest[4 * i : 4 * i + 4]) for i in range(blocks)]
        wt, bt, wl, bl = rest[4 * blocks : 4 * blocks + 4]
        slabs = rest[4 * blocks + 4 : -1]
        out_ref = refs[-1]
        i = pl.program_id(0)
        layer = [0]  # conv depth counter → per-layer absolute offsets

        def conv(src, wr, br, relu=False, mask=True):
            rows, cols = src.shape[0] - 2, src.shape[1] - 2
            acc = None
            for dy in range(3):
                rws = src[dy : dy + rows]
                for dx in range(3):
                    t = jax.lax.dot_general(
                        rws[:, dx : dx + cols, :],
                        wr[dy * 3 + dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = t if acc is None else acc + t
            acc = acc + br[0].astype(jnp.float32)
            if relu:
                acc = jnp.maximum(acc, 0.0)
            layer[0] += 1
            if mask:
                # zero everything outside the frame so the NEXT conv sees
                # XLA SAME zero-padding semantics (the single outer pad
                # would otherwise leak bias/relu values through the halo)
                r0 = i * th - d + layer[0]
                c0 = layer[0] - d
                # 3-D (rows, cols, 1) iotas: inserting a minor dim on the
                # 2-D bool mask is unsupported for non-32-bit types
                rids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 0) + r0
                cids = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 1) + c0
                inside = (
                    (rids >= 0) & (rids < fh) & (cids >= 0) & (cids < fw)
                )
                acc = jnp.where(inside, acc, 0.0)
            return acc.astype(jnp.bfloat16)

        x = jnp.concatenate([r[:] for r in slabs], axis=0)
        x = x[: th + 2 * d, : w + 2 * d, :]
        feat = conv(x, wh, bh)
        h = feat
        for w1, b1, w2, b2 in blk:
            t1 = conv(h, w1, b1, relu=True)
            c2 = conv(t1, w2, b2)
            h = h[2:-2, 2:-2, :] + jnp.asarray(0.2, jnp.bfloat16) * c2
        ht = conv(h, wt, bt)
        off = d - 2  # feat is th+2(d−1) wide, ht is th+2 — center align
        ht = ht + feat[off : off + th + 2, off : off + w + 2, :]
        out_ref[:] = conv(ht, wl, bl, mask=False)

    return kernel


@functools.lru_cache(maxsize=8)
def make_trunk_fused(
    h: int, w: int, cin: int, cmid: int, cout: int, blocks: int, th: int = 16,
    vmem_limit_mb: int = 100,
):
    """Fused ESRGANLiteTPU trunk: ``(x_bf16 [H, W, cin], params) → bf16
    [H, W, cout]`` in one pallas_call. ``params`` is the flat tuple
    ``(head_k, head_b, [blk_k1, blk_b1, blk_k2, blk_b2]…, trunk_k, trunk_b,
    tail_k, tail_b)`` with 3×3 HWIO kernels. None when shapes don't tile."""
    if cin % 128 or cmid % 128 or cout % 128:
        return None
    d = 3 + 2 * blocks
    n_slabs = -(-(th + 2 * d) // th)
    nb = -(-h // th)
    wp = -(-(w + 2 * d) // 8) * 8
    interpret = jax.default_backend() == "cpu"

    w_specs = []
    for ci, co in (
        [(cin, cmid)]
        + [(cmid, cmid)] * (2 * blocks)
        + [(cmid, cmid), (cmid, cout)]
    ):
        w_specs.append(
            pl.BlockSpec((9, ci, co), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        )
        w_specs.append(
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    slab_specs = [
        pl.BlockSpec(
            (th, wp, cin),
            functools.partial(lambda s, i: (i + s, 0, 0), s),
            memory_space=pltpu.VMEM,
        )
        for s in range(n_slabs)
    ]

    call = pl.pallas_call(
        _trunk_kernel(th, w, d, blocks, h, w),
        out_shape=jax.ShapeDtypeStruct((nb * th, w, cout), jnp.bfloat16),
        grid=(nb,),
        in_specs=w_specs + slab_specs,
        out_specs=pl.BlockSpec(
            (th, w, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        # the unrolled 9·(3+2·blocks) f32 dot temporaries overflow the 16 MB
        # default scoped-vmem limit; v5e has 128 MiB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        ),
        interpret=interpret,
    )

    def fn(x: jax.Array, params) -> jax.Array:
        xp = jnp.pad(
            x.astype(jnp.bfloat16),
            ((d, (nb + n_slabs - 1) * th - h - d), (d, wp - w - d), (0, 0)),
        )
        flat = []
        for p in params:
            p = jnp.asarray(p, jnp.bfloat16)
            flat.append(
                p.reshape(9, p.shape[-2], p.shape[-1]) if p.ndim == 4
                else p.reshape(1, -1)
            )
        return call(*flat, *([xp] * n_slabs))[:h]

    return fn
