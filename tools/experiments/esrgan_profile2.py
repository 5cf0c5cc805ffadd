"""Stage profile of the tpu4 phase-domain serving path at 1080p→4K."""

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

    def t(fn, state, label, iters=20):
        spf = device_timer(fn, state, iters=iters, overhead_s=overhead)
        print(f"{label:46s} {spf*1000:8.3f} ms", flush=True)
        return spf

    model = el.ESRGANLiteTPU(upscale=2, stride=4, features=128)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    rgb = jax.device_put(
        jnp.asarray(rng.random((1, H, W, 3), np.float32), jnp.bfloat16)
    )

    ap = jax.jit(lambda s: model.apply(params, s, phase_domain=True))

    def net_body(s):
        o = ap(s)
        return s + (o[:, :1, :1, :3] * 1e-9).astype(s.dtype)

    t(net_body, rgb, "net phases bf16 (s2d4, 128ch trunk)")

    ph = jax.device_put(jnp.asarray(rng.random((1, 270, 480, 192), np.float32), jnp.bfloat16))

    def quant(s):
        u8 = jnp.clip(jnp.round(s.astype(jnp.float32) * 255.0), 0, 255).astype(jnp.uint8)
        return s + u8[:, :1, :1, :1].astype(jnp.bfloat16)  # live

    t(quant, ph, "quantize phases to u8 (270p x192)")

    ph8 = jax.device_put(jnp.asarray(rng.integers(0, 256, (270, 480, 192), np.uint8)))

    def d2s(s):
        o = s.reshape(270, 480, 8, 8, 3).transpose(0, 2, 1, 3, 4).reshape(2160, 3840, 3)
        return s + o[:1, :1, :1]  # live

    t(d2s, ph8, "u8 d2s transpose 270p->4K")

    a = jax.device_put(jnp.asarray(rng.integers(0, 256, (H, W, 4), np.uint8)))

    def alpha(s):
        al = jnp.broadcast_to(s[..., 3:][:, None, :, None, :], (H, 2, W, 2, 1)).reshape(2 * H, 2 * W, 1)
        return s + al[:1, :1, :1]  # live

    t(alpha, a, "alpha nearest broadcast")

    img4 = jax.device_put(jnp.asarray(rng.integers(0, 256, (H, W, 4), np.uint8)))

    def prep(s):
        rgb = s[None, ..., :3].astype(jnp.bfloat16) * jnp.asarray(1.0 / 255.0, jnp.bfloat16)
        return s + rgb[0, :, :, :1].astype(jnp.uint8)  # live

    t(prep, img4, "input prep u8->bf16 [H,W,3] channel-minor")

    # full serving fn
    fn = el.make_pretrained_upscaler.__wrapped__(H, W, 2 * H, 2 * W)
    jfn = jax.jit(fn)
    img = jax.device_put(jnp.asarray(rng.integers(0, 256, (H, W, 4), np.uint8)))
    t(lambda s: jfn(s)[:H, :W, :], img, "full serving fn")


if __name__ == "__main__":
    main()
