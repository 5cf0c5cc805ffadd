"""Does int8 actually buy conv throughput on this v5e backend through XLA?

The r2 floor analysis assumed "+19%" from int8 without measuring. v5e's MXU
is spec'd at 2x int8 vs bf16 (394 vs 197 TOPS); whether XLA emits the int8
MXU path for NHWC 3x3 convs through the axon tunnel is an open question.

Times a chain of 3x3 SAME convs at the tpu4b2 trunk shape [1,270,480,128]:
  a) f32 in / f32 kernel, default precision (single-pass bf16 on MXU)
  b) bf16 in / bf16 kernel
  c) int8 in / int8 kernel -> preferred_element_type=int32 (requant to int8
     between layers with a shift, so the chain stays int8)
  d) [context] the same chain at C=192 head width

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/experiments/int8_conv_probe.py
(background, no timeout-kill).
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nu_scaler_tpu.utils.tracing import device_timer

H, W, C = 270, 480, 128
DEPTH = 6  # enough chained convs to swamp boundary effects


def log(*a):
    print(*a, flush=True)


def dn():
    return lax.conv_dimension_numbers((1, H, W, C), (3, 3, C, C), ("NHWC", "HWIO", "NHWC"))


def chain_f32(x, ks):
    for k in ks:
        x = lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn())
        x = jnp.maximum(x, 0.0)
    return x


def chain_int8(x, ks):
    # int8 conv -> int32 accum -> requant to int8 via arithmetic shift.
    for k in ks:
        y = lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn(),
            preferred_element_type=jnp.int32,
        )
        y = jnp.maximum(y, 0)  # relu in int32
        x = (y >> 7).astype(jnp.int8)
    return x


def main():
    dev = jax.devices()[0]
    log(f"device {dev}")
    rng = np.random.default_rng(0)

    x32 = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    ks32 = [jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
            for _ in range(DEPTH)]
    x16 = x32.astype(jnp.bfloat16)
    ks16 = [k.astype(jnp.bfloat16) for k in ks32]
    x8 = jnp.asarray(rng.integers(-100, 100, (1, H, W, C)), jnp.int8)
    ks8 = [jnp.asarray(rng.integers(-100, 100, (3, 3, C, C)), jnp.int8)
           for _ in range(DEPTH)]

    # state-threaded bodies for device_timer (scalar-ish live output)
    def body_f32(s):
        return jnp.sum(chain_f32(x32 + s * 1e-9, ks32)) * 1e-9

    def body_bf16(s):
        return (jnp.sum(chain_f32(x16 + s.astype(jnp.bfloat16) * 1e-9, ks16))
                .astype(jnp.float32) * 1e-9)

    def body_i8(s):
        xi = (x8.astype(jnp.int32) + s.astype(jnp.int32) % 2).astype(jnp.int8)
        return jnp.sum(chain_int8(xi, ks8)).astype(jnp.float32) * 1e-9

    flops = 2 * H * W * C * C * 9 * DEPTH
    for name, body, s0 in (
        ("f32-default", body_f32, jnp.float32(0)),
        ("bf16", body_bf16, jnp.float32(0)),
        ("int8->int32", body_i8, jnp.float32(0)),
    ):
        spf = device_timer(body, s0, iters=40)
        log(f"{name:14s}: {spf*1e3/DEPTH:.4f} ms/conv  "
            f"{flops/spf/1e12:.1f} T(FL)OPS  ({spf*1e3:.3f} ms chain)")


if __name__ == "__main__":
    main()
