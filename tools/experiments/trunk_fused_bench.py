"""TPU probe: whole-trunk fused Pallas conv (make_trunk_fused) for tpu4b2
vs the XLA conv chain — compile, parity, and the th ladder.

Priors: XLA conv ≈0.393 ms/conv at [270,480,128] (≈97 TF/s), the per-layer
Pallas conv 0.196 ms but composed-slower (HBM round trips break fusion);
7-conv chain ≈3.1 ms of the 4.14 ms tpu4b2 frame. Fused trunk at th=16
predicts ≈2.2 ms (37% halo recompute).

Run on the TPU, background, uninterrupted."""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


NH, NW, C, BLOCKS, COUT = 270, 480, 128, 2, 256


def main() -> None:
    from nu_scaler_tpu.kernels.conv_pallas import make_trunk_fused
    from nu_scaler_tpu.utils.tracing import device_timer

    log(f"device {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    def mk(ci, co):
        return (
            jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.float32),
            jnp.asarray(rng.standard_normal(co) * 0.01, jnp.float32),
        )

    params = [*mk(C, C)]
    for _ in range(BLOCKS):
        params += [*mk(C, C), *mk(C, C)]
    params += [*mk(C, C), *mk(C, COUT)]
    params = tuple(params)

    x0 = jnp.asarray(rng.standard_normal((NH, NW, C)) * 0.3, jnp.bfloat16)

    def conv(x, k, b, relu=False):
        y = jax.lax.conv_general_dilated(
            x[None], k.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0] + b.astype(x.dtype)
        return jnp.maximum(y, 0) if relu else y

    def xla_chain(x):
        hk, hb = params[0], params[1]
        feat = conv(x, hk, hb)
        h = feat
        for bi in range(BLOCKS):
            k1, b1, k2, b2 = params[2 + 4 * bi : 6 + 4 * bi]
            t1 = conv(h, k1, b1, relu=True)
            h = h + jnp.asarray(0.2, h.dtype) * conv(t1, k2, b2)
        tk, tb, lk, lb = params[2 + 4 * BLOCKS :]
        return conv(conv(h, tk, tb) + feat, lk, lb)

    # chained live loop: out feeds back into x (keeps the graph on-device)
    def live(fn):
        def body(state):
            x, acc = state
            o = fn(x)
            acc = acc + jnp.sum(o[:1, :8, 0].astype(jnp.float32))
            nx = x + o[:NH, :NW, :C].astype(jnp.bfloat16) * jnp.asarray(
                1e-6, jnp.bfloat16
            )
            return nx, acc

        return body

    ref = None
    t = device_timer(live(jax.jit(xla_chain)), (x0, jnp.zeros((), jnp.float32)),
                     iters=10) * 1e3
    log(f"XLA conv chain  : {t:7.3f} ms")
    ref = np.asarray(jax.jit(xla_chain)(x0), np.float32)

    for th, vmem in ((16, 100), (8, 100), (24, 100), (32, 100)):
        try:
            fn = make_trunk_fused(
                NH, NW, C, C, COUT, BLOCKS, th=th, vmem_limit_mb=vmem
            )
            fused = jax.jit(lambda x: fn(x, params))
            out = np.asarray(fused(x0), np.float32)
            d = np.abs(out - ref)
            t = device_timer(
                live(fused), (x0, jnp.zeros((), jnp.float32)), iters=10
            ) * 1e3
            log(
                f"fused trunk th={th:2d}: {t:7.3f} ms   "
                f"maxdiff {d.max():.4f} (scale {np.abs(ref).max():.2f})"
            )
        except Exception as e:  # noqa: BLE001
            log(f"fused trunk th={th:2d}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
