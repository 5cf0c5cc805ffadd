"""How many stacked convs can one Pallas kernel hold on this backend?
The 7-layer whole-trunk kernel SIGKILLs the remote compile helper at every
th (compile-time OOM, trunk_fused_bench.py); a single conv compiles. Probe
plain L-conv stacks (L=2,3,4) at vmem_limit=100MB, th=16 — if L≥3 works,
the tpu4b2 trunk splits as head+block0 (3 convs) | block1+trunk+tail (4).

Usage: conv_stack_probe.py L [th]. Run on the TPU, background."""

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


def main() -> None:
    L = int(sys.argv[1])
    th = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from nu_scaler_tpu.utils.tracing import device_timer

    log(f"device {jax.devices()[0]} L={L} th={th}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NH, NW, C)) * 0.3, jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((9, C, C)) * 0.02, jnp.bfloat16)

    d = L
    n_slabs = -(-(th + 2 * d) // th)
    nb = -(-NH // th)
    wp = -(-(NW + 2 * d) // 8) * 8

    def kern(wr, *rest):
        slabs, out = rest[:-1], rest[-1]
        a = jnp.concatenate([r[:] for r in slabs], axis=0)
        a = a[: th + 2 * d, : NW + 2 * d, :]
        for l in range(L):
            rows = th + 2 * (d - 1 - l)
            cols = NW + 2 * (d - 1 - l)
            acc = None
            for dy in range(3):
                rws = a[dy : dy + rows]
                for dx in range(3):
                    t = jax.lax.dot_general(
                        rws[:, dx : dx + cols, :],
                        wr[dy * 3 + dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = t if acc is None else acc + t
            a = acc.astype(jnp.bfloat16)
        out[:] = a

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nb * th, NW, C), jnp.bfloat16),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((9, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        ]
        + [
            pl.BlockSpec(
                (th, wp, C),
                functools.partial(lambda s, i: (i + s, 0, 0), s),
                memory_space=pltpu.VMEM,
            )
            for s in range(n_slabs)
        ],
        out_specs=pl.BlockSpec(
            (th, NW, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def fn(xx):
        xp = jnp.pad(
            xx, ((d, (nb + n_slabs - 1) * th - NH - d), (d, wp - NW - d), (0, 0))
        )
        return call(k1, *([xp] * n_slabs))[:NH]

    jf = jax.jit(fn)
    out = jf(x)
    out.block_until_ready()
    log(f"L={L} th={th}: compiled OK, shape={out.shape}")

    def body(state):
        xx, acc = state
        o = jf(xx)
        acc = acc + jnp.sum(o[:1, :8, 0].astype(jnp.float32))
        nx = xx + o * jnp.asarray(1e-6, jnp.bfloat16)
        return nx, acc

    t = device_timer(body, (x, jnp.zeros((), jnp.float32)), iters=10) * 1e3
    log(f"L={L} th={th}: {t:7.3f} ms  ({t/L:.3f} ms/conv)")


def scratch_variant(th: int = 16):
    """L=2 with the intermediate written to a VMEM scratch ref: Mosaic may
    fold ref slices into loads (the value-chained form runs 1.17 ms/conv —
    the hypothesis is that slicing MXU-produced VALUES forces relayouts)."""
    from nu_scaler_tpu.utils.tracing import device_timer

    log(f"device {jax.devices()[0]} scratch L=2 th={th}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NH, NW, C)) * 0.3, jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((9, C, C)) * 0.02, jnp.bfloat16)
    d = 2
    n_slabs = -(-(th + 2 * d) // th)
    nb = -(-NH // th)
    wp = -(-(NW + 2 * d) // 8) * 8

    def kern(wr, *rest):
        slabs, out, scr = rest[:-2], rest[-2], rest[-1]
        a = jnp.concatenate([r[:] for r in slabs], axis=0)
        a = a[: th + 4, : NW + 4, :]
        acc = None
        for dy in range(3):
            rws = a[dy : dy + th + 2]
            for dx in range(3):
                t = jax.lax.dot_general(
                    rws[:, dx : dx + NW + 2, :], wr[dy * 3 + dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
        scr[: th + 2, : NW + 2, :] = acc.astype(jnp.bfloat16)
        acc = None
        for dy in range(3):
            for dx in range(3):
                t = jax.lax.dot_general(
                    scr[dy : dy + th, dx : dx + NW, :], wr[dy * 3 + dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
        out[:] = acc.astype(jnp.bfloat16)

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nb * th, NW, C), jnp.bfloat16),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((9, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        ]
        + [
            pl.BlockSpec(
                (th, wp, C),
                functools.partial(lambda s, i: (i + s, 0, 0), s),
                memory_space=pltpu.VMEM,
            )
            for s in range(n_slabs)
        ],
        out_specs=pl.BlockSpec(
            (th, NW, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((th + 8, wp, C), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def fn(xx):
        xp = jnp.pad(
            xx, ((d, (nb + n_slabs - 1) * th - NH - d), (d, wp - NW - d), (0, 0))
        )
        return call(k1, *([xp] * n_slabs))[:NH]

    jf = jax.jit(fn)
    out = jf(x)
    out.block_until_ready()
    log(f"scratch L=2 th={th}: compiled OK shape={out.shape}")

    def body(state):
        xx, acc = state
        o = jf(xx)
        acc = acc + jnp.sum(o[:1, :8, 0].astype(jnp.float32))
        nx = xx + o * jnp.asarray(1e-6, jnp.bfloat16)
        return nx, acc

    t = device_timer(body, (x, jnp.zeros((), jnp.float32)), iters=10) * 1e3
    log(f"scratch L=2 th={th}: {t:7.3f} ms  ({t/2:.3f} ms/conv)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "scratch":
        scratch_variant(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    else:
        main()
