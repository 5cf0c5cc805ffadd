"""Stage-level profile of the ESRGAN serving path at 1080p→4K."""

import numpy as np

import jax
import jax.numpy as jnp

from nu_scaler_tpu.models import esrgan_lite as el
from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

H, W = 1080, 1920


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    overhead = fetch_overhead_s()
    iters = 20
    rng = np.random.default_rng(0)

    def t(fn, state, label):
        spf = device_timer(fn, state, iters=iters, overhead_s=overhead)
        print(f"{label:44s} {spf*1000:8.3f} ms", flush=True)
        return spf

    x = jax.device_put(jnp.asarray(rng.random((1, H, W, 3), np.float32)))

    # 1. the 4K bilinear base resize (channel-minor f32 suspicion)
    t(
        lambda s: jax.image.resize(s, (1, 2 * H, 2 * W, 3), "bilinear")[:, :H, :W, :],
        x,
        "jax.image.resize 1080p->4K f32 [.,.,3]",
    )

    # 2. alpha plane resize [H,W,1]
    a = jax.device_put(jnp.asarray(rng.random((H, W, 1), np.float32)))
    t(
        lambda s: jax.image.resize(s, (2 * H, 2 * W, 1), "bilinear")[:H, :W, :],
        a,
        "jax.image.resize alpha [H,W,1]",
    )

    # 3. trunk-only (net minus base): nn.Conv vs ShiftConv at 540p/64ch
    xb = x.astype(jnp.bfloat16)

    class TrunkS(el.nn.Module):
        @el.nn.compact
        def __call__(self, z):
            n, h, w, c = z.shape
            s2d = z.reshape(n, h // 2, 2, w // 2, 2, c)
            s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
            feat = el.ShiftConv(64, name="head")(s2d)
            hdn = feat
            for i in range(3):
                hdn = el.ResBlockS(64, name=f"block{i}")(hdn)
            hdn = el.ShiftConv(64, name="trunk")(hdn) + feat
            return el.ShiftConv(48, name="tail")(hdn)

    class TrunkC(el.nn.Module):
        @el.nn.compact
        def __call__(self, z):
            n, h, w, c = z.shape
            s2d = z.reshape(n, h // 2, 2, w // 2, 2, c)
            s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
            feat = el.nn.Conv(64, (3, 3), padding="SAME", name="head")(s2d)
            hdn = feat
            for i in range(3):
                hdn = el.ResBlock(64, name=f"block{i}")(hdn)
            hdn = el.nn.Conv(64, (3, 3), padding="SAME", name="trunk")(hdn) + feat
            return el.nn.Conv(48, (3, 3), padding="SAME", name="tail")(hdn)

    for name, cls in (("ShiftConv", TrunkS), ("nn.Conv", TrunkC)):
        m = cls()
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
        p = jax.tree_util.tree_map(lambda q: q.astype(jnp.bfloat16), p)
        ap = jax.jit(lambda pp, s: m.apply(pp, s))

        def body(s, ap=ap, p=p):
            o = ap(p, s)  # [1, 540, 960, 48]
            pert = (o[:, :1, :1, :1] * 1e-9).astype(s.dtype)
            return s + pert

        try:
            t(body, xb, f"trunk 540p bf16 ({name})")
        except Exception as e:
            print(f"{name} FAILED: {str(e)[:200]}", flush=True)

    # 4. d2s tail reshape + add base + pack at 4K
    tail = jax.device_put(jnp.asarray(rng.random((1, 540, 960, 48), np.float32), jnp.bfloat16))
    base = jax.device_put(jnp.asarray(rng.random((1, 2160, 3840, 3), np.float32)))

    def pack(s):
        n, nh, nw, c = s.shape
        o = s.reshape(n, nh, nw, 4, 4, 3).transpose(0, 1, 3, 2, 4, 5).reshape(n, nh * 4, nw * 4, 3)
        full = base + o.astype(jnp.float32)
        u8 = jnp.clip(jnp.round(full * 255.0), 0, 255).astype(jnp.uint8)
        return s + u8[:, :1, :1, :1].astype(jnp.bfloat16) * 0

    t(pack, tail, "d2s(4,4) + base add + u8 pack at 4K")


if __name__ == "__main__":
    main()
