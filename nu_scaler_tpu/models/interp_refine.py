"""Learned MC-interpolation refinement — the "beyond parity" quality tier
for frame generation.

The production flow_soft path (pyramid flow → block-MC overlapped-tile soft
warp) reaches 24.03 dB mid-frame PSNR on held-out 1080p clips, +2.3 dB over
the reference-shipped cross-fade (`wgpu_interpolator.rs:216` ships
mix(A,B,t); the designed HS pipeline was never wired). The r3 occlusion
probes measured a +4-5 dB per-pixel selection ceiling INSIDE warp tiles
that handcrafted selectors can't reach (block-quantized warps disagree on
~93% of textured pixels — occlusion_selector_probe.py). This module learns
that selection: a small phase-domain conv net reads (A, B, soft-warp mid)
and predicts a residual correction to the mid.

TPU-first design mirrors the learned SR tier (`esrgan_lite.py`): trunk at
1/4 resolution via space-to-depth (the 12-channel triplet s2d is exactly
192 = 1.5×128 lanes), 3×3 convs on the MXU, phase-domain tail, and a fused
raw-domain serving graph (selector-matmul s2d, free-reshape d2s) with the
same optional int8 trunk.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nu_scaler_tpu.models import esrgan_lite as el


class InterpRefineTPU(nn.Module):
    """[N, H, W, 9] (A, B, mid RGB in [0,1]) → residual [N, H, W, 3].

    s2d(stride) front end → head conv → `blocks` residual blocks → phase
    tail (st²·3) → depth-to-space. The mid-add global skip lives in the
    caller (serving adds in the raw u8 domain)."""

    features: int = 128
    blocks: int = 1
    stride: int = 4

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        st = self.stride
        s2d = x.reshape(n, h // st, st, w // st, st, c)
        s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // st, w // st, st * st * c)
        feat = nn.Conv(self.features, (3, 3), padding="SAME", name="head")(s2d)
        hdn = feat
        for i in range(self.blocks):
            hdn = el.ResBlock(self.features, name=f"block{i}")(hdn)
        tail = nn.Conv(st * st * 3, (3, 3), padding="SAME", name="tail")(hdn)
        nh, nw = h // st, w // st
        out = tail.reshape(n, nh, nw, st, st, 3)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, 3)


# ---------------------------------------------------------------------------
# Checkpoints (orbax, same layout as the SR tier)
# ---------------------------------------------------------------------------

from nu_scaler_tpu.models.train import CKPT_ROOT

CKPT_DIR = os.path.join(CKPT_ROOT, "interp_ref4")


def save_checkpoint(params, step: int) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(CKPT_DIR)
    ocp.PyTreeCheckpointer().save(os.path.join(path, str(step)), params, force=True)
    with open(os.path.join(path, "latest.txt"), "w") as f:
        f.write(str(step))
    return path


def load_checkpoint():
    import orbax.checkpoint as ocp

    path = os.path.abspath(CKPT_DIR)
    latest = os.path.join(path, "latest.txt")
    if not os.path.exists(latest):
        return None
    step = int(open(latest).read().strip())
    params = ocp.PyTreeCheckpointer().restore(os.path.join(path, str(step)))
    return params, step


def make_model(features: int = 128, blocks: int = 1):
    model = InterpRefineTPU(features=features, blocks=blocks)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 9), jnp.float32))
    return model, params


# ---------------------------------------------------------------------------
# Data: triplet pool through the production warp
# ---------------------------------------------------------------------------


class TripletPool:
    """Pre-rendered (A, B, production-mid, target) crop pool.

    Mids are computed by the PRODUCTION soft warp on the FULL frame (warp
    tiles are global), then cropped — so the net trains on exactly the
    artifacts it must fix at serving time. Frames render at the serving
    resolution (1080p default) so the warp's resolution-dependent choices
    (quarter-res flow at ≥720 rows, tile-to-frame geometry) match too.
    Training seeds 100.. stay disjoint from the 900+ eval seeds."""

    def __init__(
        self,
        rng: np.random.Generator,
        crop: int = 96,
        n_clips: int = 12,
        frames_per_clip: int = 8,
        pool_size: int = 4096,
        seed0: int = 100,
        height: int = 1080,
        width: int = 1920,
    ):
        from nu_scaler_tpu.models.data import clip_through_video_path, render_clip
        from nu_scaler_tpu.ops.interpolate import soft_interp_fast

        mid_fn = jax.jit(lambda a, b: soft_interp_fast(a, b, 0.5))
        triplets = []  # (A, B, mid, target) full frames u8 RGBA
        for c in range(n_clips):
            clip = clip_through_video_path(
                render_clip(height, width, seed=seed0 + c, frames=frames_per_clip)
            )
            for k in range(1, len(clip) - 1):
                a, b, tgt = clip[k - 1], clip[k + 1], clip[k]
                mid = np.asarray(mid_fn(jnp.asarray(a), jnp.asarray(b)))
                triplets.append((a, b, mid, tgt))
        xs = np.empty((pool_size, crop, crop, 9), np.float32)
        ys = np.empty((pool_size, crop, crop, 3), np.float32)
        for i in range(pool_size):
            a, b, mid, tgt = triplets[rng.integers(0, len(triplets))]
            y = rng.integers(0, a.shape[0] - crop + 1)
            x = rng.integers(0, a.shape[1] - crop + 1)
            sl = np.s_[y : y + crop, x : x + crop, :3]
            xs[i] = np.concatenate(
                [a[sl], b[sl], mid[sl]], axis=-1
            ).astype(np.float32) / 255.0
            ys[i] = tgt[sl].astype(np.float32) / 255.0
        self.xs, self.ys = xs, ys


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def train(
    steps: int = 8000,
    batch: int = 8,
    lr: float = 2e-4,
    seed: int = 0,
    crop: int = 96,
    n_clips: int = 12,
    pool_size: int = 4096,
    log_every: int = 100,
    save: bool = True,
    height: int = 1080,
    width: int = 1920,
) -> float:
    rng = np.random.default_rng(seed)
    model, params = make_model()
    start = 0
    restored = load_checkpoint()
    if restored is not None:
        params, start = restored
        print(f"resumed from step {start}", flush=True)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, pool_x, pool_y, idx):
        # the pool stays device-resident; per step only `idx` crosses the
        # tunnel (the host link is ~49 MB/s — shipping the batch would cost
        # more than the step)
        xb = jnp.take(pool_x, idx, axis=0)
        yb = jnp.take(pool_y, idx, axis=0)

        def lf(p):
            mid = xb[..., 6:9]
            pred = mid + model.apply(p, xb)
            return jnp.mean(jnp.abs(pred - yb))

        lv, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, lv

    print("rendering triplet pool (production soft-warp mids)...", flush=True)
    pool = TripletPool(
        rng, crop=crop, n_clips=n_clips, pool_size=pool_size,
        height=height, width=width,
    )
    pool_x = jax.device_put(pool.xs)
    pool_y = jax.device_put(pool.ys)

    loss = float("nan")
    t0 = time.time()
    for s in range(steps):
        idx = rng.integers(0, pool.xs.shape[0], size=batch)
        params, opt_state, loss = step_fn(
            params, opt_state, pool_x, pool_y, jnp.asarray(idx)
        )
        if s % log_every == 0:
            print(f"step {s:5d}  loss {float(loss):.5f}  ({time.time()-t0:.1f}s)",
                  flush=True)
    print(f"final loss {float(loss):.5f}", flush=True)
    if save:
        path = save_checkpoint(jax.device_get(params), start + steps)
        print(f"checkpoint: {path}", flush=True)
    return float(loss)


# ---------------------------------------------------------------------------
# Serving: fused raw-domain graph (selector-matmul s2d, free-reshape d2s)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def get_refine_graph(in_h: int, in_w: int, dtype=jnp.bfloat16):
    """TRACEABLE u8 RGBA (a, b, mid) [H, W, 4] ×3 → refined mid u8 RGBA —
    for inlining into a larger jit program (ops.interpolate mode
    "flow_soft_ref" composes it after the soft warp so XLA fuses the
    boundary). None when no trained checkpoint exists.

    Raw-domain graph like `make_serving_fn_fused`: the 1/255 input
    normalization folds into the head kernel, ×255 into the tail kernel;
    s2d rides the one-hot row-phase selector matmuls; d2s is the free
    lane-slice reshape. Alpha passes through from the mid frame."""
    restored = load_checkpoint()
    if restored is None:
        return None
    params, _step = restored
    p = params["params"] if "params" in params else params
    model, _ = make_model()
    st = model.stride

    nh, nw = in_h // st, in_w // st
    # head kernel: I = st²·9 RGB rows → expand to st²·12 RGBA rows (alpha
    # rows zero) ×(1/255); the three frames concat on the channel axis
    # BEFORE s2d, so the s2d channel order is (pixel-phase, frame, rgb[a])
    hk = np.asarray(p["head"]["kernel"], np.float32)  # [3,3,st²·9,F]
    kh, kw, _i, F = hk.shape
    hk12 = np.zeros((kh, kw, st * st * 12, F), np.float32)
    for q in range(st * st):
        for f in range(3):
            hk12[:, :, q * 12 + f * 4 : q * 12 + f * 4 + 3, :] = (
                hk[:, :, q * 9 + f * 3 : q * 9 + f * 3 + 3, :] / 255.0
            )
    head_k = jnp.asarray(hk12)
    head_b = jnp.asarray(np.asarray(p["head"]["bias"], np.float32))
    blocks = []
    i = 0
    while f"block{i}" in p:
        blk = p[f"block{i}"]
        blocks.append(
            tuple(
                (jnp.asarray(np.asarray(blk[c]["kernel"], np.float32)),
                 jnp.asarray(np.asarray(blk[c]["bias"], np.float32)))
                for c in ("conv1", "conv2")
            )
        )
        i += 1
    tail_k = jnp.asarray(np.asarray(p["tail"]["kernel"], np.float32) * 255.0)
    tail_b = jnp.asarray(np.asarray(p["tail"]["bias"], np.float32) * 255.0)
    sels = el._row_phase_selectors(in_h, st)

    def conv(x, k, b=None):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y if b is None else y + b.astype(x.dtype)

    def fn(a_u8, b_u8, mid_u8):
        x = jnp.concatenate([a_u8, b_u8, mid_u8], axis=-1)  # [H, W, 12] u8
        x2d = x.reshape(in_h, in_w * 12).astype(dtype)
        s2d = jnp.concatenate(
            [
                jnp.einsum("or,rw->ow", sels[q].astype(dtype), x2d)
                .reshape(nh, nw, st * 12)[None]
                for q in range(st)
            ],
            axis=-1,
        )  # [1, nh, nw, st²·12] raw-scale
        h = conv(s2d, head_k, head_b)
        for (k1, b1), (k2, b2) in blocks:
            t1 = jax.nn.relu(conv(h, k1, b1))
            h = h + jnp.asarray(0.2, h.dtype) * conv(t1, k2, b2)
        tail = conv(h, tail_k, tail_b)[0]  # [nh, nw, st²·3] raw residual
        # d2s + mid-add: per row-phase lane slice → free column reshape
        res_rows = [
            tail[..., q * st * 3 : (q + 1) * st * 3].reshape(nh, in_w, 3)
            for q in range(st)
        ]
        res = jnp.stack(res_rows, axis=1).reshape(in_h, in_w, 3)
        rgb = jnp.clip(
            jnp.round(mid_u8[..., :3].astype(jnp.float32) + res.astype(jnp.float32)),
            0, 255,
        ).astype(jnp.uint8)
        return jnp.concatenate([rgb, mid_u8[..., 3:]], axis=-1)

    return fn


@functools.lru_cache(maxsize=8)
def _make_refine_fn(in_h: int, in_w: int, dtype=jnp.bfloat16):
    fn = get_refine_graph(in_h, in_w, dtype)
    return None if fn is None else jax.jit(fn)


def refine_available() -> bool:
    return os.path.exists(os.path.join(os.path.abspath(CKPT_DIR), "latest.txt"))


def refine_mid(a_u8, b_u8, mid_u8):
    """Refine a production soft-warp mid frame (u8 RGBA). Returns the mid
    unchanged when no trained checkpoint exists or dims don't tile."""
    h, w = int(mid_u8.shape[0]), int(mid_u8.shape[1])
    if h % 4 or w % 4:
        return mid_u8
    fn = _make_refine_fn(h, w)
    if fn is None:
        return mid_u8
    return fn(a_u8, b_u8, mid_u8)


def make_apply(params=None):
    """Float-domain forward for eval: (a, b, mid RGB [0,1]) → refined."""
    if params is None:
        restored = load_checkpoint()
        if restored is None:
            raise ValueError("no interp_ref4 checkpoint")
        params = restored[0]
    model, _ = make_model()

    @jax.jit
    def fn(a, b, mid):
        x = jnp.concatenate([a, b, mid], axis=-1)
        return mid + model.apply(params, x)

    return fn


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--clips", type=int, default=12)
    ap.add_argument("--pool", type=int, default=4096)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    train(steps=args.steps, batch=args.batch, lr=args.lr,
          n_clips=args.clips, pool_size=args.pool,
          height=args.height, width=args.width)
