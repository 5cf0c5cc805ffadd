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
