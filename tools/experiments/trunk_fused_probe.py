"""Mosaic bisect for the whole-trunk fused conv kernel (HTTP 500 at every
th in trunk_fused_bench.py). Ladder: start from the known-good single-conv
shape (kernels/conv_pallas.make_conv3x3 compiles) and add one feature per
rung: 3 input slabs, iota mask, stacked convs, residual adds, 256-out tail.

Run on the TPU, background, uninterrupted."""

from __future__ import annotations

import functools
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


NH, NW, C = 270, 480, 128
TH = 16


def run(name, build):
    try:
        out = build()
        out.block_until_ready()
        log(f"{name:28s}: OK shape={out.shape}")
    except Exception as e:  # noqa: BLE001
        log(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:150]}")


def make_call(kernel, d, n_slabs, cout, th=TH):
    nb = -(-NH // th)
    wp = -(-(NW + 2 * d) // 8) * 8
    slab_specs = [
        pl.BlockSpec(
            (th, wp, C),
            functools.partial(lambda s, i: (i + s, 0, 0), s),
            memory_space=pltpu.VMEM,
        )
        for s in range(n_slabs)
    ]
    w_spec = pl.BlockSpec((9, C, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb * th, NW, cout), jnp.bfloat16),
        grid=(nb,),
        in_specs=[w_spec] + slab_specs,
        out_specs=pl.BlockSpec(
            (th, NW, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def fn(x, k):
        xp = jnp.pad(
            x, ((d, (nb + n_slabs - 1) * th - NH - d), (d, wp - NW - d), (0, 0))
        )
        return call(k, *([xp] * n_slabs))[:NH]

    return fn


def conv_body(src, wr, rows, cols):
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
    return acc


def main() -> None:
    log(f"device {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NH, NW, C)) * 0.3, jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((9, C, C)) * 0.05, jnp.bfloat16)

    # rung 1: single conv, d=1, THREE slabs (same math as make_conv3x3)
    def kern1(wr, x0, x1, x2, out):
        slab = jnp.concatenate([x0[:], x1[:], x2[:]], axis=0)
        s = slab[: TH + 2, : NW + 2, :]
        out[:] = conv_body(s, wr, TH, NW).astype(jnp.bfloat16)

    run("1 three-slab single conv", lambda: jax.jit(make_call(kern1, 1, 3, C))(x, k1))

    # rung 2: + iota mask
    def kern2(wr, x0, x1, x2, out):
        slab = jnp.concatenate([x0[:], x1[:], x2[:]], axis=0)
        s = slab[: TH + 2, : NW + 2, :]
        acc = conv_body(s, wr, TH, NW)
        i = pl.program_id(0)
        rids = jax.lax.broadcasted_iota(jnp.int32, (TH, NW), 0) + i * TH
        cids = jax.lax.broadcasted_iota(jnp.int32, (TH, NW), 1)
        inside = (rids >= 0) & (rids < NH) & (cids >= 0) & (cids < NW)
        out[:] = jnp.where(inside[..., None], acc, 0.0).astype(jnp.bfloat16)

    run("2 + iota mask", lambda: jax.jit(make_call(kern2, 1, 3, C))(x, k1))

    # rung 3: two stacked convs, d=2
    def kern3(wr, x0, x1, x2, out):
        slab = jnp.concatenate([x0[:], x1[:], x2[:]], axis=0)
        s = slab[: TH + 4, : NW + 4, :]
        a = conv_body(s, wr, TH + 2, NW + 2).astype(jnp.bfloat16)
        out[:] = conv_body(a, wr, TH, NW).astype(jnp.bfloat16)

    run("3 two stacked convs d=2", lambda: jax.jit(make_call(kern3, 2, 3, C))(x, k1))

    # rung 4: seven stacked convs, d=7 (tpu4b2 depth, no skips)
    def kern4(wr, x0, x1, x2, out):
        slab = jnp.concatenate([x0[:], x1[:], x2[:]], axis=0)
        a = slab[: TH + 14, : NW + 14, :]
        for l in range(7):
            rows = TH + 12 - 2 * l
            cols = NW + 12 - 2 * l
            a = conv_body(a, wr, rows, cols).astype(jnp.bfloat16)
        out[:] = a

    run("4 seven stacked convs d=7", lambda: jax.jit(make_call(kern4, 7, 3, C))(x, k1))


if __name__ == "__main__":
    main()
