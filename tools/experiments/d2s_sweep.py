"""d2s (phase→raster) strategies at [270,480,192] u8 → [2160,3840,3]:
find one that isn't a tens-of-ms relayout."""

import numpy as np

import jax
import jax.numpy as jnp

from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    overhead = fetch_overhead_s()
    rng = np.random.default_rng(0)
    ph = jax.device_put(jnp.asarray(rng.integers(0, 256, (270, 480, 192), np.uint8)))

    def t(fn, label):
        try:
            spf = device_timer(fn, ph, iters=20, overhead_s=overhead)
            print(f"{label:52s} {spf*1000:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{label} FAILED: {str(e)[:160]}", flush=True)

    def live(s, o):
        return s + o[:1, :1, :1]

    # A: the naive 5-D transpose
    def v_naive(s):
        o = s.reshape(270, 480, 8, 8, 3).transpose(0, 2, 1, 3, 4).reshape(2160, 3840, 3)
        return live(s, o)

    t(v_naive, "A naive 5-D transpose")

    # B: single mid-axis transpose, col interleave by free reshape
    def v_mid(s):
        o = s.reshape(270, 480, 8, 24).transpose(0, 2, 1, 3).reshape(2160, 3840, 3)
        return live(s, o)

    t(v_mid, "B mid-axis transpose + free col reshape")

    # C: 8 channel slices -> free col reshape -> stack rows
    def v_stack(s):
        ts = [s[..., p * 24 : (p + 1) * 24].reshape(270, 3840, 3) for p in range(8)]
        o = jnp.stack(ts, axis=1).reshape(2160, 3840, 3)
        return live(s, o)

    t(v_stack, "C 8 lane slices + stack rows")

    # D: concat variant of C
    def v_concat(s):
        ts = [s[..., p * 24 : (p + 1) * 24].reshape(270, 1, 3840, 3) for p in range(8)]
        o = jnp.concatenate(ts, axis=1).reshape(2160, 3840, 3)
        return live(s, o)

    t(v_concat, "D 8 lane slices + concat rows")

    # E: row interleave via 1-tap scatter matmul (bf16-exact ints)
    perm = np.zeros((8, 2160, 270), np.float32)
    for p in range(8):
        perm[p, np.arange(270) * 8 + p, np.arange(270)] = 1.0
    perm_b = jnp.asarray(perm, jnp.bfloat16)

    def v_matmul(s):
        acc = None
        for p in range(8):
            tp = s[..., p * 24 : (p + 1) * 24].reshape(270, 3840 * 3).astype(jnp.bfloat16)
            v = jnp.einsum("or,rk->ok", perm_b[p], tp)
            acc = v if acc is None else acc + v
        o = acc.astype(jnp.uint8).reshape(2160, 3840, 3)
        return live(s, o)

    t(v_matmul, "E row scatter-matmul (bf16)")

    # F: the new RGBA-phase serving fn end-to-end
    from nu_scaler_tpu.models import esrgan_lite as el

    fn = jax.jit(el.make_pretrained_upscaler.__wrapped__(1080, 1920, 2160, 3840))
    img = jax.device_put(jnp.asarray(rng.integers(0, 256, (1080, 1920, 4), np.uint8)))
    spf = device_timer(lambda s: fn(s)[:1080, :1920, :], img, iters=20, overhead_s=overhead)
    print(f"{'F full RGBA-phase serving fn':52s} {spf*1000:8.3f} ms  ({1.0/spf:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
