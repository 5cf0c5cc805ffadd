"""TPU: d2s (depth-to-space) as a pure-DMA Pallas copy.

The serving graph's d2s — phases u8 [270, 480, 256] → 4K raster [2160,
15360] — costs 1.26 ms in the r3 prefix profile as 8 lane-slices + row
stack. Observation: the target is exactly the transpose [270, 480, 8, 32]
→ [270, 8, 480, 32] (free-reshape to raster), i.e. pure data movement —
33 MB r+w ≈ 0.08 ms at HBM speed. Kernel: grid (270/ty, 8), in block
(ty, 480, 32) at lane offset 32p, out block (ty, 1, 480, 32) — both
grid-affine, kernel body is a copy. Ladder over ty.

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


NH, NW, R = 270, 480, 8  # phases [NH, NW, R*R*4]; raster [NH*R, NW*R*4]
CP = R * 4  # 32 lanes per row-phase


def make_d2s(ty: int):
    grid = (NH // ty, R)
    call = pl.pallas_call(
        lambda i_ref, o_ref: o_ref.__setitem__((slice(None), 0), i_ref[:]),
        out_shape=jax.ShapeDtypeStruct((NH, R, NW, CP), jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ty, NW, CP), lambda i, p: (i, 0, p), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (ty, 1, NW, CP), lambda i, p: (i, p, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def fn(phases):  # [NH, NW, R²·4] u8 → [NH·R, NW·R·4] u8 raster
        return call(phases).reshape(NH * R, NW * CP)

    return fn


def xla_d2s(phases):
    rows = [
        phases[..., p * CP : (p + 1) * CP].reshape(NH, NW * CP) for p in range(R)
    ]
    return jnp.stack(rows, axis=1).reshape(NH * R, NW * CP)


def main() -> None:
    from nu_scaler_tpu.utils.tracing import device_timer

    log(f"device {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    ph = jnp.asarray(
        rng.integers(0, 256, (NH, NW, R * R * 4), np.uint8)
    )

    def live(fn):
        def body(state):
            x, acc = state
            o = fn(x)
            acc = acc + jnp.max(o[:1, :8].astype(jnp.int32)).astype(jnp.float32)
            nx = x + (acc.astype(jnp.uint8) % 2)
            return nx, acc

        return body

    jx = jax.jit(xla_d2s)
    ref = np.asarray(jx(ph))
    t = device_timer(live(jx), (ph, jnp.zeros((), jnp.float32)), iters=10) * 1e3
    log(f"XLA slices+stack d2s : {t:7.3f} ms")

    for ty in (27, 54, 135):
        try:
            fn = jax.jit(make_d2s(ty))
            out = np.asarray(fn(ph))
            ok = np.array_equal(out, ref)
            t = device_timer(
                live(fn), (ph, jnp.zeros((), jnp.float32)), iters=10
            ) * 1e3
            log(f"pallas DMA d2s ty={ty:3d}: {t:7.3f} ms  exact={ok}")
        except Exception as e:  # noqa: BLE001
            log(f"pallas DMA d2s ty={ty:3d}: FAILED {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
