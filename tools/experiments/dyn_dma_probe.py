"""Mosaic capability probe: can make_async_copy DMA from an HBM ref at
DYNAMIC offsets (from prefetched scalars) on BOTH dims, including
non-128-lane-aligned byte offsets?

If yes, the soft-warp kernel can DMA candidate windows straight from the
padded frame and the XLA-side slab-stack build (~1.4 ms/pair at 1080p, all
lane-rotate relayouts) disappears.

Run on the TPU, background, uninterrupted."""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offs, src_hbm, out_ref, buf, sem, rows, cols, mode):
    i = pl.program_id(0)
    oy = offs[2 * i]
    ox = offs[2 * i + 1]
    if mode == "row-affine":  # control: grid-affine row offset (v4 uses this)
        src = src_hbm.at[pl.ds(i * rows, rows), pl.ds(0, cols)]
    elif mode == "row-dyn":
        src = src_hbm.at[pl.ds(oy, rows), pl.ds(0, cols)]
    elif mode == "col-dyn":
        src = src_hbm.at[pl.ds(0, rows), pl.ds(ox, cols)]
    else:  # both
        src = src_hbm.at[pl.ds(oy, rows), pl.ds(ox, cols)]
    cp = pltpu.make_async_copy(src, buf, sem)
    cp.start()
    cp.wait()
    out_ref[0] = buf[...]


def main() -> None:
    print(f"device {jax.devices()[0]}", flush=True)
    rows, cols = 16, 512  # cols in u8 lanes (128 px RGBA would be 512)
    h, w = 256, 4096
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
    n = 4
    for mode, offsets in (
        ("row-affine", [(0, 0), (16, 0), (32, 0), (48, 0)]),
        ("row-dyn", [(3, 0), (5, 0), (9, 0), (131, 0)]),
        ("col-dyn", [(0, 512), (0, 1024), (0, 2048), (0, 512)]),
        ("col-dyn-unal", [(0, 4), (0, 36), (0, 1004), (0, 2044)]),
        ("both-dyn", [(3, 4), (5, 36), (9, 1004), (131, 2044)]),
    ):
        offs = jnp.asarray(np.array(offsets, np.int32).reshape(-1))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, rows, cols), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((rows, cols), jnp.uint8),
                pltpu.SemaphoreType.DMA,
            ],
        )
        call = pl.pallas_call(
            functools.partial(_kernel, rows=rows, cols=cols, mode=mode),
            out_shape=jax.ShapeDtypeStruct((n, rows, cols), jnp.uint8),
            grid_spec=grid_spec,
        )
        try:
            out = np.asarray(jax.jit(lambda o, s: call(o, s))(offs, src))
            src_np = np.asarray(src)
            if mode == "row-affine":
                offsets_eff = [(i * rows, 0) for i in range(n)]
            else:
                offsets_eff = offsets
            ok = all(
                np.array_equal(out[i], src_np[oy : oy + rows, ox : ox + cols])
                for i, (oy, ox) in enumerate(offsets_eff)
            )
            print(f"{mode:14s}: compiled, correct={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:14s}: FAILED — {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
