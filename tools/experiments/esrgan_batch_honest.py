"""Honest single-chip batch=2 probe (r4): is the vmapped serving graph
actually faster per frame than single-frame dispatch?

Answer: NO — see the measured table at the bottom. Run on the TPU,
background, uninterrupted:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/experiments/esrgan_batch_honest.py
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp
from nu_scaler_tpu.models import esrgan_lite as el
from nu_scaler_tpu.models.train import load_checkpoint, load_act_scales
from nu_scaler_tpu.utils.tracing import device_timer, fetch_overhead_s
IN_H, IN_W = 1080, 1920
ov = fetch_overhead_s()
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (IN_H, IN_W, 4), np.uint8)
pair = jax.device_put(jnp.stack([jnp.asarray(img)]*2))
single_dev = jax.device_put(jnp.asarray(img))
def chain(cur, out):
    v = (jnp.sum(out.astype(jnp.int32)) % 2).astype(jnp.float32)
    return jnp.clip(cur.astype(jnp.float32) + v, 0, 255).astype(jnp.uint8)

def run(tag, arch, blocks, io):
    params, step = load_checkpoint(1, arch)
    scales = dict(load_act_scales(1, arch, step) or {})
    if not io:
        scales.pop("head", None); scales.pop("base", None)
    m = el.ESRGANLiteTPU(upscale=2, stride=4, features=128, blocks=blocks)
    f = el.make_serving_fn_fused(m, params, IN_H, IN_W, quant_scales=scales or None)
    t1 = device_timer(lambda s: chain(s, f(s)), single_dev, 12, ov)
    fb = jax.jit(jax.vmap(f))
    t2 = device_timer(lambda s: chain(s, fb(s)), pair, 10, ov)
    print(f"{tag:24s}: single {t1*1000:6.3f} ms ({1/t1:6.1f})  batch2 {t2*1000/2:6.3f} ms/f ({2/t2:6.1f})", flush=True)

run("tpu4b2-int8+io", "tpu4b2", 2, True)
run("tpu4b2-int8", "tpu4b2", 2, False)
run("tpu4-int8", "tpu4", 3, False)

# Measured (r4, TPU v5e, honest device-resident pair + full-sum chain):
#   tpu4b2-int8+io : single 3.226 ms (310.0)   batch2 3.805 ms/f (262.8)
#   tpu4b2-int8    : single 3.477 ms (287.6)   batch2 3.629 ms/f (275.5)
#   tpu4-int8      : single 3.776 ms (264.8)   batch2 3.928 ms/f (254.6)
# => single-chip batch=2 is a NEGATIVE at 1080p→4K serving shapes. The
# +42% "batch win" in esrgan_surgery7.py arm D was an artifact: that arm
# built jnp.stack([u8]*batch) INSIDE the jitted graph, so the stacked
# operand was provably a broadcast of one frame and XLA elided the
# duplicate lane's work. A real [2,H,W,4] pair (this probe) cannot be
# elided and the batched program relayouts cost more than the dispatch
# overhead it amortizes. Batching still pays as dp across a MESH
# (mesh.esrgan_batch_sharded: N chips = ~N× throughput) — just not
# within one chip at these shapes.

if __name__ == "__main__":
    pass  # main body runs at import (script form); kept as a record
