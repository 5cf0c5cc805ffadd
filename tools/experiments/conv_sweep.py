"""XLA conv efficiency sweep on the axon v5e: same FLOPs, different
geometry — find where the conv lowering stops wasting the MXU."""

import numpy as np

import jax
import jax.numpy as jnp

from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    overhead = fetch_overhead_s()
    rng = np.random.default_rng(0)

    cases = [
        # (H, W, Cin, Cout)  — all ≈19 GMAC per conv except where noted
        (540, 960, 64, 64),
        (270, 480, 128, 128),
        (135, 240, 256, 256),
        (540, 960, 128, 128),  # 4x FLOPs: efficiency probe
        (544, 960, 64, 64),    # H multiple of 8
        (540, 1024, 64, 64),   # W multiple of 128
    ]
    for h, w, ci, co in cases:
        x = jax.device_put(jnp.asarray(rng.random((1, h, w, ci), np.float32), jnp.bfloat16))
        k = jax.device_put(jnp.asarray(rng.random((3, 3, ci, co), np.float32), jnp.bfloat16))

        @jax.jit
        def conv(s, k=k):
            return jax.lax.conv_general_dilated(
                s, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        def body(s, conv=conv, ci=ci, co=co):
            o = conv(s)
            if ci == co:
                return o
            return s + o[..., :ci] * 0

        try:
            spf = device_timer(body, x, iters=20, overhead_s=overhead)
            gmac = h * w * 9 * ci * co / 1e9
            eff = gmac * 2 / 1e3 / spf / 394.0 * 100  # % of peak bf16
            print(
                f"conv {h}x{w}x{ci}->{co}: {spf*1000:7.3f} ms  {gmac:6.1f} GMAC  {eff:5.1f}% peak",
                flush=True,
            )
        except Exception as e:
            print(f"conv {h}x{w}x{ci}->{co} FAILED: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
