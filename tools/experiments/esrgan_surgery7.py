"""Serving surgery v7 (r4): where can the int8 quality tier find 300 fps?

VERDICT r3 #3 wants the learned quality tier at >= 300 fps with >= +5 dB
held-out. tpu4-int8 serves 260 fps; tpu4b2-int8 times 277.5 at +4.90. The
trunk is at its measured conv floor (conv_stack_probe), so the remaining
levers are (a) the graph's FIXED costs (s2d/head 0.95, base ~?, d2s 0.33),
(b) a wider-shallower trunk (C=160/192, blocks<=2), (c) batching.

Arms (1080p→4K, chained fori-style live loop, slope-timed):
  A. production fused graphs: tpu4 / tpu4b2 / tpu4b1, int8 — the per-block
     in-context cost and the fixed-cost intercept.
  B. custom int8 graph ablations on tpu4 (real weights + calibration):
     full parity check, no-base, base-int8@128, head-int8@128, both-int8,
     no-d2s — each stage's IN-CONTEXT cost (prefix-ladder style standalone
     numbers over-attribute ~2×, CLAUDE.md).
  C. wider-shallower candidates, random weights, synthetic scales (timing
     only): C160b2 / C192b2 / C192b1 — is width-at-constant-capacity ever
     faster once 128 lanes are already full?
  D. batch=2 vmap throughput (transcode-style amortization; latency 2×).

CAVEAT (r4, post-hoc): arm D's +42% batch win was an ARTIFACT — it built
jnp.stack([u8]*batch) INSIDE the jitted graph, so the stacked operand was
provably a broadcast of one frame and XLA elided the duplicate lane's
work. The honest probe (device-resident distinct-pair input,
esrgan_batch_honest.py) measures single-chip batch=2 SLOWER per frame on
every int8 graph. Arms A-C (single-frame, in-context ablations) stand.

Run on the TPU, background, uninterrupted.
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


IN_H, IN_W, OUT_H, OUT_W = 1080, 1920, 2160, 3840
ST, UP = 4, 2
R = ST * UP
NH, NW = IN_H // ST, IN_W // ST


def main() -> None:
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.models import esrgan_lite as el
    from nu_scaler_tpu.models.train import load_act_scales, load_checkpoint
    from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s

    ov = fetch_overhead_s()
    log(f"device {jax.devices()[0]}, overhead {ov*1000:.1f} ms")

    img = generate_test_pattern(IN_W, IN_H)
    img[480:600, 640:760, :3] = 255
    x_u8 = jnp.asarray(img)

    def chain(u8, out):
        v = jnp.sum(jnp.abs(out.reshape(-1)[:64].astype(jnp.float32) - 0.37)) % 2.0
        return jnp.clip(u8.astype(jnp.float32) + v, 0, 255).astype(jnp.uint8)

    def time_fn(tag, f, ref=None, iters=12):
        out = np.asarray(f(x_u8))
        note = ""
        if ref is not None and out.shape == ref.shape:
            err = out[..., :3].astype(np.float64) - ref[..., :3].astype(np.float64)
            p = 10 * np.log10(255.0**2 / max(float(np.mean(err**2)), 1e-12))
            note = f"  parity {p:5.1f} dB"
        t = device_timer(lambda s, f=f: chain(s, f(s)), x_u8, iters, ov)
        log(f"{tag:34s}: {t*1000:7.3f} ms ({1.0/t:6.1f} fps){note}")
        return t

    # ---- A. production fused graphs, int8 ----------------------------------
    log("--- A. production int8 graphs (per-block in-context cost) ---")
    prod_t = {}
    ref_out = None
    for arch, blocks in (("tpu4", 3), ("tpu4b2", 2), ("tpu4b1", 1)):
        restored = load_checkpoint(1, arch)
        if restored is None:
            log(f"{arch}: no checkpoint, skipped")
            continue
        params, step = restored
        scales = load_act_scales(1, arch, step)
        if scales is None:
            log(f"{arch}: no act scales, skipped")
            continue
        model = el.ESRGANLiteTPU(upscale=2, stride=ST, features=128, blocks=blocks)
        f = el.make_serving_fn_fused(model, params, IN_H, IN_W,
                                     quant_scales=scales)
        t = time_fn(f"A. {arch}-int8 production", f, ref_out)
        prod_t[arch] = t
        if arch == "tpu4":
            ref_out = np.asarray(f(x_u8))
    if "tpu4" in prod_t and "tpu4b1" in prod_t:
        per_block = (prod_t["tpu4"] - prod_t["tpu4b1"]) / 2.0
        log(f"   per-block in-context: {per_block*1000:.3f} ms; "
            f"fixed intercept (b0): {(prod_t['tpu4b1']-per_block)*1000:.3f} ms")

    # ---- B. custom int8 ablations on tpu4 -----------------------------------
    log("--- B. tpu4-int8 stage ablations (in-context) ---")
    params, step = load_checkpoint(1, "tpu4")
    scales = load_act_scales(1, "tpu4", step)
    p = params["params"] if "params" in params else params
    head_k = el._expand_in_rgba(
        np.asarray(p["head"]["kernel"], np.float32), ST, 1 / 255.0
    )
    head_k128 = np.concatenate(
        [head_k, np.zeros((3, 3, 128 - head_k.shape[2], head_k.shape[-1]),
                          np.float32)], axis=2,
    )
    head_b = jnp.asarray(np.asarray(p["head"]["bias"], np.float32))
    hk128 = jnp.asarray(head_k128)
    hq128, hdq128 = (jnp.asarray(a) for a in el._quant_kernel_i8(head_k128))
    tk, tb = el._expand_out_rgba(
        np.asarray(p["tail"]["kernel"], np.float32),
        np.asarray(p["tail"]["bias"], np.float32), R, 255.0,
    )
    tail_b = jnp.asarray(tb)
    tq, tdq = (jnp.asarray(a) for a in el._quant_kernel_i8(tk))
    blocks_q = []
    i = 0
    while f"block{i}" in p:
        blk = p[f"block{i}"]
        blocks_q.append(tuple(
            tuple(jnp.asarray(a) for a in
                  el._quant_kernel_i8(np.asarray(blk[c]["kernel"], np.float32)))
            + (jnp.asarray(np.asarray(blk[c]["bias"], np.float32)),
               scales[f"block{i}/{c}"])
            for c in ("conv1", "conv2")
        ))
        i += 1
    trq, trdq = (jnp.asarray(a) for a in el._quant_kernel_i8(
        np.asarray(p["trunk"]["kernel"], np.float32)))
    trunk_b = jnp.asarray(np.asarray(p["trunk"]["bias"], np.float32))
    base_k = el._bilinear_base_kernel(4, UP, ST).astype(np.float32)
    base_k128 = np.concatenate(
        [base_k, np.zeros((3, 3, 128 - base_k.shape[2], base_k.shape[-1]),
                          np.float32)], axis=2,
    )
    bk64 = jnp.asarray(base_k)
    bq128, bdq128 = (jnp.asarray(a) for a in el._quant_kernel_i8_dc(base_k128))
    sels = el._row_phase_selectors(IN_H, ST)

    def conv(x, k, b=None, pad="SAME"):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y if b is None else y + b.astype(x.dtype)

    def graph(u8, base_mode="bf16", head_mode="bf16", d2s=True, batch=None):
        def one(u8):
            x2d = u8.reshape(IN_H, IN_W * 4).astype(jnp.bfloat16)
            s2d = jnp.concatenate(
                [
                    jnp.einsum("or,rw->ow", sels[q].astype(jnp.bfloat16), x2d)
                    .reshape(NH, NW, ST * 4)[None]
                    for q in range(ST)
                ],
                axis=-1,
            )
            s2d128 = jnp.concatenate([s2d, jnp.zeros_like(s2d)], axis=-1)
            if head_mode == "int8":
                feat = el._conv_i8(s2d128, hq128, hdq128, head_b, 255.0)
            else:
                feat = conv(s2d128, hk128, head_b)
            h = feat
            for (kq1, dq1, b1, ax1), (kq2, dq2, b2, ax2) in blocks_q:
                t1 = jax.nn.relu(el._conv_i8(h, kq1, dq1, b1, ax1))
                h = h + jnp.asarray(0.2, h.dtype) * el._conv_i8(t1, kq2, dq2, b2, ax2)
            h = el._conv_i8(h, trq, trdq, trunk_b, scales["trunk"]) + feat
            tail = el._conv_i8(h, tq, tdq, tail_b, scales["tail"])
            if base_mode == "none":
                phases = tail
            elif base_mode == "int8":
                sp = jnp.pad(s2d128, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
                phases = tail + el._conv_i8(sp, bq128, bdq128, None, 255.0,
                                            pad="VALID")
            else:
                sp = jnp.pad(s2d, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
                phases = tail + conv(sp, bk64, pad="VALID")
            ph_u8 = jnp.clip(jnp.round(phases[0]), 0, 255).astype(jnp.uint8)
            if not d2s:
                return ph_u8
            rows = [
                ph_u8[..., q * R * 4 : (q + 1) * R * 4].reshape(NH, OUT_W, 4)
                for q in range(R)
            ]
            return jnp.stack(rows, axis=1).reshape(OUT_H, OUT_W, 4)

        if batch:
            return jax.vmap(one)(jnp.stack([u8] * batch))
        return one(u8)

    for tag, kw in (
        ("B. full (parity w/ prod)", {}),
        ("B. no base", dict(base_mode="none")),
        ("B. base int8@128", dict(base_mode="int8")),
        ("B. head int8@128", dict(head_mode="int8")),
        ("B. head+base int8@128", dict(base_mode="int8", head_mode="int8")),
        ("B. no d2s (phases out)", dict(d2s=False)),
    ):
        f = jax.jit(functools.partial(graph, **kw))
        time_fn(tag, f, ref_out)

    # D. batch=2 (vmap) — per-frame throughput
    f2 = jax.jit(functools.partial(graph, batch=2))
    out2 = np.asarray(f2(x_u8))
    assert out2.shape[0] == 2
    t2 = device_timer(lambda s: chain(s, f2(s)), x_u8, 12, ov)
    log(f"{'D. batch=2 vmap (per frame)':34s}: {t2*1000/2:7.3f} ms "
        f"({2.0/t2:6.1f} fps)  [latency/frame {t2*1000:.3f} ms]")

    # ---- C. wider-shallower candidates (random weights, timing only) -------
    log("--- C. wider-shallower int8 graphs (random weights, timing only) ---")
    for feats, blocks in ((160, 2), ((192), 2), (192, 1), (256, 1)):
        model = el.ESRGANLiteTPU(upscale=2, stride=ST, features=feats,
                                 blocks=blocks)
        prm = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32))
        syn = {f"block{i}/{c}": 1.0 for i in range(blocks)
               for c in ("conv1", "conv2")}
        syn.update(trunk=1.0, tail=1.0)
        f = el.make_serving_fn_fused(model, prm, IN_H, IN_W, quant_scales=syn)
        time_fn(f"C. C{feats}b{blocks}-int8 random", f)


if __name__ == "__main__":
    main()
