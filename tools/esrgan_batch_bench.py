"""tpu4 learned tier: batched inference scaling + input-prep variants."""

import numpy as np

import jax
import jax.numpy as jnp

from nu_scaler_tpu.models import esrgan_lite as el
from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

H, W = 1080, 1920


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    overhead = fetch_overhead_s()
    rng = np.random.default_rng(0)

    m = el.ESRGANLiteTPU(upscale=2, stride=4, features=128)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    p = jax.tree_util.tree_map(lambda q: q.astype(jnp.bfloat16), p)
    ap = jax.jit(lambda s: m.apply(p, s, phase_domain=True))

    for n in (1, 2, 4):
        x = jax.device_put(
            jnp.asarray(rng.random((n, H, W, 3), np.float32), jnp.bfloat16)
        )
        spf = device_timer(
            lambda s: s + (ap(s)[:, :1, :1, :3] * 1e-9).astype(s.dtype),
            x, iters=20, overhead_s=overhead,
        )
        print(f"net phases n={n}: {spf*1000:7.3f} ms  {n/spf:7.1f} frames/s", flush=True)

    # prep variants: channel-minor bf16 mul vs u8 s2d-first
    img = jax.device_put(jnp.asarray(rng.integers(0, 256, (H, W, 4), np.uint8)))

    def prep_a(s):  # current: [H,W,3] channel-minor cast+mul
        rgb = s[None, ..., :3].astype(jnp.bfloat16) * jnp.asarray(1 / 255.0, jnp.bfloat16)
        return s + rgb[0, :, :, :1].astype(jnp.uint8)

    def prep_b(s):  # s2d in u8 first (free reshape + mid-axis transpose), then cast
        t = s[..., :3].reshape(270, 4, 480, 4, 3).transpose(0, 2, 1, 3, 4)
        t = t.reshape(270, 480, 48).astype(jnp.bfloat16) * jnp.asarray(1 / 255.0, jnp.bfloat16)
        return s + t[:, :, :1].astype(jnp.uint8)

    for f, name in ((prep_a, "prep A channel-minor"), (prep_b, "prep B u8 s2d-first")):
        spf = device_timer(f, img, iters=20, overhead_s=overhead)
        print(f"{name}: {spf*1000:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
