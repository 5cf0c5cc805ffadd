"""Mosaic bisect round 2 (probe1: 3-slab single conv OK; iota mask FAILED;
stacked convs failed 0.4 s after the mask crash — possibly a poisoned
compile helper, re-test in isolation). Rungs, each in its own process via
--rung N so one crash can't poison the next:

  1: two stacked convs d=2 (no mask) — isolation retest
  2: mask via an INPUT ref slab (no iota, no program_id arithmetic)
  3: two stacked convs + input-ref masks
  4: seven stacked convs d=7 (helper SIGKILL retest, th=16)

Run on the TPU, background, uninterrupted."""

from __future__ import annotations

import functools
import os
import sys

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


def make_call(kernel, d, n_slabs, cout, with_mask, th=TH):
    nb = -(-NH // th)
    wp = -(-(NW + 2 * d) // 8) * 8
    slab = lambda shape: [
        pl.BlockSpec(
            shape,
            functools.partial(
                (lambda s, i: (i + s, 0, 0)) if len(shape) == 3
                else (lambda s, i: (i + s, 0)), s
            ),
            memory_space=pltpu.VMEM,
        )
        for s in range(n_slabs)
    ]
    w_spec = pl.BlockSpec((9, C, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [w_spec] + slab((th, wp, C))
    if with_mask:
        in_specs += slab((th, wp))
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb * th, NW, cout), jnp.bfloat16),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (th, NW, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def fn(x, k):
        xp = jnp.pad(
            x, ((d, (nb + n_slabs - 1) * th - NH - d), (d, wp - NW - d), (0, 0))
        )
        args = [k] + [xp] * n_slabs
        if with_mask:
            m = jnp.pad(
                jnp.ones((NH, NW), jnp.bfloat16),
                ((d, (nb + n_slabs - 1) * th - NH - d), (d, wp - NW - d)),
            )
            args += [m] * n_slabs
        return call(*args)[:NH]

    return fn


def main() -> None:
    rung = int(sys.argv[1])
    log(f"device {jax.devices()[0]} rung {rung}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NH, NW, C)) * 0.3, jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((9, C, C)) * 0.05, jnp.bfloat16)

    if rung == 1:
        def kern(wr, x0, x1, x2, out):
            s = jnp.concatenate([x0[:], x1[:], x2[:]], axis=0)[: TH + 4, : NW + 4, :]
            a = conv_body(s, wr, TH + 2, NW + 2).astype(jnp.bfloat16)
            out[:] = conv_body(a, wr, TH, NW).astype(jnp.bfloat16)

        fn = make_call(kern, 2, 3, C, False)
    elif rung == 2:
        def kern(wr, x0, x1, x2, m0, m1, m2, out):
            s = jnp.concatenate([x0[:], x1[:], x2[:]], axis=0)[: TH + 2, : NW + 2, :]
            m = jnp.concatenate([m0[:], m1[:], m2[:]], axis=0)
            acc = conv_body(s, wr, TH, NW)
            acc = acc * m[1 : 1 + TH, 1 : 1 + NW].astype(jnp.float32)[..., None]
            out[:] = acc.astype(jnp.bfloat16)

        fn = make_call(kern, 1, 3, C, True)
    elif rung == 3:
        def kern(wr, x0, x1, x2, m0, m1, m2, out):
            s = jnp.concatenate([x0[:], x1[:], x2[:]], axis=0)[: TH + 4, : NW + 4, :]
            m = jnp.concatenate([m0[:], m1[:], m2[:]], axis=0)
            a = conv_body(s, wr, TH + 2, NW + 2)
            a = a * m[1 : TH + 3, 1 : NW + 3].astype(jnp.float32)[..., None]
            a = a.astype(jnp.bfloat16)
            out[:] = conv_body(a, wr, TH, NW).astype(jnp.bfloat16)

        fn = make_call(kern, 2, 3, C, True)
    else:
        def kern(wr, *rest):
            slabs, out = rest[:-1], rest[-1]
            a = jnp.concatenate([r[:] for r in slabs], axis=0)
            a = a[: TH + 14, : NW + 14, :]
            for l in range(7):
                a = conv_body(a, wr, TH + 12 - 2 * l, NW + 12 - 2 * l).astype(
                    jnp.bfloat16
                )
            out[:] = a

        fn = make_call(kern, 7, 3, C, False)

    out = jax.jit(fn)(x, k1)
    out.block_until_ready()
    log(f"rung {rung}: OK shape={out.shape} mean={np.asarray(out, np.float32).mean():.4f}")


if __name__ == "__main__":
    main()
