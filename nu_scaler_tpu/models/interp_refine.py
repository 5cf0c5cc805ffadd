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


def _ckpt_dir(name: str = "interp_ref4") -> str:
    """Checkpoint dir per net name: "interp_ref4" is THE serving net; other
    names (e.g. the wide distillation teacher "interp_ref4w") live beside it
    and are never picked up by the serving graphs."""
    return os.path.abspath(os.path.join(CKPT_ROOT, name))


def save_checkpoint(params, step: int, name: str = "interp_ref4") -> str:
    import orbax.checkpoint as ocp

    path = _ckpt_dir(name)
    ocp.PyTreeCheckpointer().save(os.path.join(path, str(step)), params, force=True)
    with open(os.path.join(path, "latest.txt"), "w") as f:
        f.write(str(step))
    return path


def load_checkpoint(name: str = "interp_ref4"):
    import orbax.checkpoint as ocp

    path = _ckpt_dir(name)
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


def save_act_scales(scales: dict, step: int) -> str:
    """Persist int8 activation scales next to the checkpoint (step-gated,
    like the SR tier's train.py:save_act_scales)."""
    import json

    path = os.path.join(os.path.abspath(CKPT_DIR), "act_scales.json")
    with open(path, "w") as f:
        json.dump({"step": step, "scales": scales}, f, indent=1)
    return path


def load_act_scales(step: int | None = None):
    """int8 activation scales for the checkpoint, or None when absent or
    calibrated against a different step than the one being served."""
    import json

    path = os.path.join(os.path.abspath(CKPT_DIR), "act_scales.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            blob = json.load(f)
    except Exception:  # noqa: BLE001 — unreadable file = no quantization
        return None
    if step is not None and blob.get("step") != step:
        return None
    scales = blob.get("scales")
    return scales if isinstance(scales, dict) and scales else None


def calibrate_scales(
    params=None,
    crops: np.ndarray | None = None,
    n_clips: int = 4,
    pool_size: int = 256,
    height: int = 1080,
    width: int = 1920,
    include_head: bool = True,
) -> dict:
    """Per-conv-input activation maxima for the int8 trunk, measured in the
    FLOAT domain (the serving head folds 1/255, so trunk activations match).
    Calibration crops come through the production soft warp on TRAINING
    seeds (TripletPool, seeds 100..) — held-out eval seeds (900+) must not
    leak in. crops: optional [N, h, w, 9] float batch to use instead."""
    if params is None:
        restored = load_checkpoint()
        if restored is None:
            raise ValueError("no interp_ref4 checkpoint")
        params = restored[0]
    p = params["params"] if "params" in params else params

    if crops is None:
        pool = TripletPool(
            np.random.default_rng(7), crop=96, n_clips=n_clips,
            pool_size=pool_size, height=height, width=width,
        )
        crops = pool.xs

    def conv_f(x, leaf):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(np.asarray(leaf["kernel"], np.float32)),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(np.asarray(leaf["bias"], np.float32))

    # stride from the head kernel's fan-in (st²·9 input channels)
    st = int(round((np.asarray(p["head"]["kernel"]).shape[2] // 9) ** 0.5))
    x = jnp.asarray(crops, jnp.float32)
    n, h, w, c = x.shape
    s2d = x.reshape(n, h // st, st, w // st, st, c)
    s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // st, w // st, st * st * c)
    scales: dict = {}
    if include_head:
        scales["head"] = float(jnp.max(jnp.abs(s2d)))
    hdn = conv_f(s2d, p["head"])
    i = 0
    while f"block{i}" in p:
        scales[f"block{i}/conv1"] = float(jnp.max(jnp.abs(hdn)))
        t1 = jax.nn.relu(conv_f(hdn, p[f"block{i}"]["conv1"]))
        scales[f"block{i}/conv2"] = float(jnp.max(jnp.abs(t1)))
        hdn = hdn + 0.2 * conv_f(t1, p[f"block{i}"]["conv2"])
        i += 1
    scales["tail"] = float(jnp.max(jnp.abs(hdn)))
    return scales


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
        factors: tuple = (2,),
        sources: tuple = ("native",),
    ):
        """factors: frame-rate multipliers to render triplets for. (2,) =
        t=0.5 only (the 2× live path). Adding 3 renders pairs THREE frames
        apart with production mids at t=1/3 and 2/3 — training data for the
        N-factor frame-generation path (soft_interp_multi / hs-soft3x-ref),
        where the t=0.5-only net measured +0.70 dB off-center and a
        t-diverse pool may close more of the remaining gap.

        sources: clip provenance mix, round-robin per clip. "native" renders
        at (height, width) directly; "down4k" renders at 2× and
        area-downsamples — the distribution a real capture pipeline feeds
        (the e2e eval measured the native-only net LOSING its gains on
        downsampled sources: 22.38 vs flow_soft 23.41 dB interpolated,
        tools/e2e_quality_eval.py)."""
        from nu_scaler_tpu.models.data import clip_through_video_path, render_clip
        from nu_scaler_tpu.ops.interpolate import soft_interp_fast

        down = None
        mid_fns = {}
        triplets = []  # (A, B, mid, target) full frames u8 RGBA
        for c in range(n_clips):
            src = sources[c % len(sources)]
            if src == "down4k":
                if down is None:
                    from nu_scaler_tpu.ops.resample import make_resampler

                    down = make_resampler(
                        2 * height, 2 * width, height, width, "area"
                    )
                big = render_clip(
                    2 * height, 2 * width, seed=seed0 + c, frames=frames_per_clip
                )
                clip = clip_through_video_path(
                    [np.asarray(down(jnp.asarray(f))) for f in big]
                )
            else:
                clip = clip_through_video_path(
                    render_clip(height, width, seed=seed0 + c, frames=frames_per_clip)
                )
            for f in factors:
                # stride 1: overlapping pairs, like the original t=0.5 pool
                for k in range(0, len(clip) - f):
                    a, b = clip[k], clip[k + f]
                    for j in range(1, f):
                        t = j / f
                        if t not in mid_fns:
                            mid_fns[t] = jax.jit(
                                functools.partial(
                                    lambda a, b, _t: soft_interp_fast(a, b, _t),
                                    _t=t,
                                )
                            )
                        mid = np.asarray(mid_fns[t](jnp.asarray(a), jnp.asarray(b)))
                        triplets.append((a, b, mid, clip[k + j]))
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
    factors: tuple = (2,),
    sources: tuple = ("native",),
    features: int = 128,
    blocks: int = 1,
    name: str = "interp_ref4",
    distill: tuple | None = None,
    distill_w: float = 0.5,
) -> float:
    """One training leg. `features`/`blocks`/`name` parameterize the net and
    its checkpoint dir (the serving net is 128/1 @ "interp_ref4"; a wider
    teacher trains under its own name and never serves). `distill` =
    (teacher_name, teacher_features, teacher_blocks) adds
    distill_w·|student − teacher| against the frozen teacher's refined mid —
    the recipe that lifted the SR tier (train.py --distill, r4)."""
    rng = np.random.default_rng(seed)
    model, params = make_model(features=features, blocks=blocks)
    start = 0
    restored = load_checkpoint(name)
    if restored is not None:
        params, start = restored
        print(f"resumed {name} from step {start}", flush=True)

    teacher = None
    if distill is not None:
        t_name, t_features, t_blocks = distill
        t_restored = load_checkpoint(t_name)
        if t_restored is None:
            raise SystemExit(f"no teacher checkpoint {t_name!r}")
        t_params = t_restored[0]
        t_model, _ = make_model(features=int(t_features), blocks=int(t_blocks))
        teacher = (t_model, t_params)
        print(f"distilling from {t_name}@{t_restored[1]} (w={distill_w})",
              flush=True)

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
            loss = jnp.mean(jnp.abs(pred - yb))
            if teacher is not None:
                t_model, t_params = teacher
                t_pred = mid + jax.lax.stop_gradient(t_model.apply(t_params, xb))
                loss = loss + distill_w * jnp.mean(jnp.abs(pred - t_pred))
            return loss

        lv, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, lv

    print("rendering triplet pool (production soft-warp mids)...", flush=True)
    pool = TripletPool(
        rng, crop=crop, n_clips=n_clips, pool_size=pool_size,
        height=height, width=width, factors=factors, sources=sources,
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
        path = save_checkpoint(jax.device_get(params), start + steps, name=name)
        print(f"checkpoint: {path}", flush=True)
    return float(loss)


def eval_refine_float(
    name: str = "interp_ref4",
    features: int = 128,
    blocks: int = 1,
    seeds=(900, 901, 902),
    frames: int = 5,
    height: int = 1080,
    width: int = 1920,
) -> dict:
    """Held-out mid-frame quality of ANY named refine checkpoint via the
    plain float-domain apply (mid + net(A, B, mid)) vs the production soft
    warp — the teacher-gating eval (the serving eval,
    data.eval_interp_refinement, only ever sees the "interp_ref4" serving
    graph). Same protocol: predict odd frames from even neighbors, seeds
    900+ held out from the training pool's 100.."""
    from nu_scaler_tpu.models.data import clip_through_video_path, render_clip
    from nu_scaler_tpu.ops.interpolate import make_interpolator
    from nu_scaler_tpu.ops.metrics import psnr, ssim

    restored = load_checkpoint(name)
    if restored is None:
        raise SystemExit(f"no checkpoint {name!r}")
    params, step = restored
    model, _ = make_model(features=features, blocks=blocks)

    @jax.jit
    def apply_fn(a, b, mid):
        x = (
            jnp.concatenate(
                [a[..., :3], b[..., :3], mid[..., :3]], axis=-1
            ).astype(jnp.float32)
            / 255.0
        )[None]
        pred = x[..., 6:9] + model.apply(params, x)
        return jnp.clip(jnp.round(pred[0] * 255.0), 0, 255).astype(jnp.uint8)

    soft_fn = make_interpolator(height, width, "flow_soft")
    soft_p, soft_s, ref_p, ref_s = [], [], [], []
    for seed in seeds:
        clip = clip_through_video_path(
            render_clip(height, width, frames=frames, seed=seed)
        )
        for k in range(1, len(clip) - 1, 2):
            a = jnp.asarray(clip[k - 1])
            b = jnp.asarray(clip[k + 1])
            truth = clip[k]
            soft = np.asarray(soft_fn(a, b, 0.5))
            refined = np.asarray(apply_fn(a, b, jnp.asarray(soft)))
            soft_p.append(psnr(soft, truth))
            soft_s.append(ssim(soft, truth))
            ref_p.append(psnr(np.dstack([refined, soft[..., 3:]]), truth))
            ref_s.append(ssim(np.dstack([refined, soft[..., 3:]]), truth))
    out = {
        "name": name,
        "step": step,
        "soft_psnr_db": float(np.mean(soft_p)),
        "soft_ssim": float(np.mean(soft_s)),
        "ref_psnr_db": float(np.mean(ref_p)),
        "ref_ssim": float(np.mean(ref_s)),
        "psnr_delta_db": float(np.mean(ref_p) - np.mean(soft_p)),
        "ssim_delta": float(np.mean(ref_s) - np.mean(soft_s)),
    }
    print(
        f"{name}@{step}: {out['ref_psnr_db']:.2f} dB / {out['ref_ssim']:.4f} "
        f"SSIM vs soft {out['soft_psnr_db']:.2f} / {out['soft_ssim']:.4f} "
        f"(Δ {out['psnr_delta_db']:+.2f} dB / {out['ssim_delta']:+.4f})",
        flush=True,
    )
    return out


# ---------------------------------------------------------------------------
# Serving: fused raw-domain graph (selector-matmul s2d, free-reshape d2s)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def get_refine_phase_graph(in_h: int, in_w: int, dtype=jnp.bfloat16):
    """TRACEABLE u8 RGBA (a, b, mid) [H, W, 4] ×3 → refined mid as a PHASE
    tensor f32 [nh, nw, st²·4] (s2d channel order, integer-valued 0..255).

    This is the net WITHOUT the d2s — consumers that immediately resample
    the refined mid should feed this straight into
    ``resample.make_phase_resampler`` so the spatial phases never leave the
    lane dim (the d2s relayout costs ~2-5 ms at 1080p; refine_bisect3/4/5).
    ``get_refine_graph`` composes the d2s epilogue for callers that need
    the full-res u8 mid itself. None when no trained checkpoint exists.

    Raw-domain graph like `make_serving_fn_fused`: the 1/255 input
    normalization folds into the head kernel, ×255 into the tail kernel;
    s2d rides the one-hot row-phase selector matmuls. Alpha passes through
    from the mid frame (the tail is RGBA-expanded with zero alpha rows and
    the mid's own phase decomposition — four cheap selector einsums — is
    added to the conv output before the round), so no elementwise op ever
    touches a lane-padded [H, W, 3] f32 array (CLAUDE.md channel-minor
    rule)."""
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
    head_b_np = np.asarray(p["head"]["bias"], np.float32)
    blocks_np = []
    i = 0
    while f"block{i}" in p:
        blk = p[f"block{i}"]
        blocks_np.append(
            tuple(
                (np.asarray(blk[c]["kernel"], np.float32),
                 np.asarray(blk[c]["bias"], np.float32))
                for c in ("conv1", "conv2")
            )
        )
        i += 1
    # RGBA-expand the tail: output order (row-phase, col-phase, rgb) →
    # (row-phase, col-phase, rgba) with zero alpha rows, so adding the mid's
    # phase decomposition reproduces alpha exactly and the d2s lane slices
    # land on 16-channel (st·4) boundaries.
    tk = np.asarray(p["tail"]["kernel"], np.float32) * 255.0  # [3,3,F,st²·3]
    tb = np.asarray(p["tail"]["bias"], np.float32) * 255.0
    tk4 = np.zeros(tk.shape[:3] + (st * st * 4,), np.float32)
    tb4 = np.zeros((st * st * 4,), np.float32)
    for q in range(st * st):
        tk4[..., q * 4 : q * 4 + 3] = tk[..., q * 3 : q * 3 + 3]
        tb4[q * 4 : q * 4 + 3] = tb[q * 3 : q * 3 + 3]
    tail_b = jnp.asarray(tb4)
    sels = el._row_phase_selectors(in_h, st)

    def conv(x, k, b=None):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y if b is None else y + b.astype(x.dtype)

    # int8 MXU trunk (auto when a calibration matching the checkpoint
    # exists): every contraction here is lane-filled (head 192-in, blocks
    # 128×128, tail 128-in) — the class int8_conv_probe.py measured at
    # 1.53× bf16 on this v5e. Which convs quantize is controlled by which
    # entries the scales file carries (like the SR tier's "head"/"base"
    # knob). The head's activation scale is calibrated in the float domain
    # and ×255 here because the serving head consumes raw u8 values.
    scales = load_act_scales(_step)

    def mk_conv(k_np, b_np, ax):
        if ax is None:
            kj = jnp.asarray(k_np)
            bj = None if b_np is None else jnp.asarray(b_np)
            return lambda x: conv(x, kj, bj)
        kq, dq = el._quant_kernel_i8(k_np)
        kqj, dqj = jnp.asarray(kq), jnp.asarray(dq)
        bj = None if b_np is None else jnp.asarray(b_np)
        return lambda x: el._conv_i8(x, kqj, dqj, bj, float(ax))

    sget = (scales or {}).get
    head_c = mk_conv(
        hk12, head_b_np,
        None if not scales or "head" not in scales else 255.0 * float(scales["head"]),
    )
    block_cs = [
        (mk_conv(k1, b1, sget(f"block{i}/conv1")),
         mk_conv(k2, b2, sget(f"block{i}/conv2")))
        for i, ((k1, b1), (k2, b2)) in enumerate(blocks_np)
    ]
    tail_c = mk_conv(tk4, None, sget("tail"))

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
        h = head_c(s2d)
        for c1, c2 in block_cs:
            t1 = jax.nn.relu(c1(h))
            h = h + jnp.asarray(0.2, h.dtype) * c2(t1)
        # mid's own phase decomposition (raw u8 values, bf16-exact): four
        # selector einsums on the 2-D mid → [nh, nw, st²·4], channel order
        # (row-phase, col-phase, rgba) — matching the RGBA-expanded tail
        mid2d = mid_u8.reshape(in_h, in_w * 4).astype(dtype)
        mid_ph = jnp.concatenate(
            [
                jnp.einsum("or,rw->ow", sels[q].astype(dtype), mid2d)
                .reshape(nh, nw, st * 4)
                for q in range(st)
            ],
            axis=-1,
        )
        tail = tail_c(h)[0]  # [nh, nw, st²·4] raw residual, alpha 0
        return jnp.clip(
            jnp.round(
                tail.astype(jnp.float32)
                + tail_b
                + mid_ph.astype(jnp.float32)
            ),
            0,
            255,
        )  # f32, integer-valued 0..255

    return fn


@functools.lru_cache(maxsize=8)
def get_refine_graph(in_h: int, in_w: int, dtype=jnp.bfloat16):
    """TRACEABLE u8 RGBA (a, b, mid) [H, W, 4] ×3 → refined mid u8 RGBA:
    ``get_refine_phase_graph`` + the d2s epilogue. None when no trained
    checkpoint exists. Consumers that resample the result should use the
    phase graph + ``make_phase_resampler`` instead (see there)."""
    phase_fn = get_refine_phase_graph(in_h, in_w, dtype)
    if phase_fn is None:
        return None
    st = InterpRefineTPU.stride
    nh, nw = in_h // st, in_w // st
    # d2s row de-interleave as ONE multi-contraction: S3[r, n, q] = 1 iff
    # r = st·n + q, contracted against the 4-D lane-split phase tensor
    # [nh, nw, q, st·4] over (n, q). NEVER lane-slice+reshape the
    # materialized [nh, nw, 64] conv output — 16-lane u8 granules misalign
    # the (32, 128) tile and the relayout costs ~5 ms at 1080p
    # (refine_bisect3/4); the one-hot selector × u8-integer values keep the
    # bf16 MXU pass bit-exact (products are 1.0×k, k ≤ 255) and took
    # net+d2s+upscale 10.86 → 5.70 ms.
    s3_np = np.zeros((in_h, nh, st), np.float32)
    for r in range(in_h):
        s3_np[r, r // st, r % st] = 1.0
    S3 = jnp.asarray(s3_np, dtype)

    def fn(a_u8, b_u8, mid_u8):
        out_ph = phase_fn(a_u8, b_u8, mid_u8)
        ph4 = out_ph.astype(dtype).reshape(nh, nw, st, st * 4)
        out3 = jax.lax.dot_general(
            S3, ph4, (((1, 2), (0, 2)), ((), ())),
            preferred_element_type=dtype,
        )  # [in_h, nw, st·4]
        return out3.reshape(in_h, in_w, 4).astype(jnp.uint8)

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


def make_quant_apply(params, scales: dict):
    """Float-domain forward with the int8 trunk — the eval twin of the
    quantized serving graph (same integer weight grid, same activation
    scales; the serving kernels differ only by the folded 1/255 and ×255
    constants, which cancel in the quantization grid).

    (a, b, mid) f32 RGB [N, h, w, 3] in [0,1] → refined [N, h, w, 3]."""
    p = params["params"] if "params" in params else params
    st = int(round((np.asarray(p["head"]["kernel"]).shape[2] // 9) ** 0.5))

    def mk(leaf, ax):
        k_np = np.asarray(leaf["kernel"], np.float32)
        b = jnp.asarray(np.asarray(leaf["bias"], np.float32))
        if ax is None:
            kj = jnp.asarray(k_np)
            return lambda x: jax.lax.conv_general_dilated(
                x, kj, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
        kq, dq = el._quant_kernel_i8(k_np)
        kqj, dqj = jnp.asarray(kq), jnp.asarray(dq)
        return lambda x: el._conv_i8(x, kqj, dqj, b, float(ax))

    sget = scales.get
    head_c = mk(p["head"], sget("head"))
    block_cs = []
    i = 0
    while f"block{i}" in p:
        block_cs.append(
            (mk(p[f"block{i}"]["conv1"], sget(f"block{i}/conv1")),
             mk(p[f"block{i}"]["conv2"], sget(f"block{i}/conv2")))
        )
        i += 1
    tail_c = mk(p["tail"], sget("tail"))

    @jax.jit
    def fn(a, b, mid):
        x = jnp.concatenate([a, b, mid], axis=-1)
        n, h, w, c = x.shape
        s2d = x.reshape(n, h // st, st, w // st, st, c)
        s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, h // st, w // st, st * st * c
        )
        hdn = head_c(s2d)
        for c1, c2 in block_cs:
            t1 = jax.nn.relu(c1(hdn))
            hdn = hdn + 0.2 * c2(t1)
        tail = tail_c(hdn)
        nh, nw = h // st, w // st
        out = tail.reshape(n, nh, nw, st, st, 3)
        res = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, 3)
        return mid + res

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
    ap.add_argument("--seed", type=int, default=0,
                    help="pool-render + batch-order seed (vary per leg to "
                         "draw fresh clips/crops)")
    ap.add_argument("--factors", type=int, nargs="+", default=[2],
                    help="frame-rate factors for the triplet pool: 2 = "
                         "t=0.5 only; '2 3' adds t=1/3, 2/3 triplets")
    ap.add_argument("--sources", nargs="+", default=["native"],
                    choices=["native", "down4k"],
                    help="clip provenance mix (round-robin per clip): "
                         "'native down4k' trains on both render-res and "
                         "downsampled-from-2x sources")
    ap.add_argument("--calibrate", action="store_true",
                    help="calibrate int8 activation scales for the current "
                         "checkpoint (training clips only) and save "
                         "act_scales.json next to it")
    ap.add_argument("--no-head", action="store_true",
                    help="with --calibrate: leave the head conv in bf16")
    ap.add_argument("--features", type=int, default=128,
                    help="net width (the serving net is 128)")
    ap.add_argument("--blocks", type=int, default=1,
                    help="residual blocks (the serving net is 1)")
    ap.add_argument("--name", default="interp_ref4",
                    help="checkpoint name; non-default names (e.g. the "
                         "distillation teacher interp_ref4w) never serve")
    ap.add_argument("--distill-name", default=None,
                    help="teacher checkpoint name to distill from")
    ap.add_argument("--distill-features", type=int, default=192)
    ap.add_argument("--distill-blocks", type=int, default=2)
    ap.add_argument("--distill-w", type=float, default=0.5)
    ap.add_argument("--eval", action="store_true",
                    help="held-out float-domain eval of --name at "
                         "--features/--blocks vs the soft warp, then exit "
                         "(teacher gating; the serving eval lives in "
                         "data.eval_interp_refinement)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.eval:
        eval_refine_float(
            name=args.name, features=args.features, blocks=args.blocks,
            height=args.height, width=args.width,
        )
        raise SystemExit(0)
    if args.calibrate:
        restored = load_checkpoint()
        if restored is None:
            raise SystemExit("no interp_ref4 checkpoint to calibrate")
        params, step = restored
        scales = calibrate_scales(
            params, n_clips=args.clips, include_head=not args.no_head,
            height=args.height, width=args.width,
        )
        path = save_act_scales(scales, step)
        print(f"saved {path}: {scales}", flush=True)
    else:
        train(steps=args.steps, batch=args.batch, lr=args.lr, seed=args.seed,
              n_clips=args.clips, pool_size=args.pool,
              height=args.height, width=args.width,
              factors=tuple(args.factors), sources=tuple(args.sources),
              features=args.features, blocks=args.blocks, name=args.name,
              distill=(
                  (args.distill_name, args.distill_features, args.distill_blocks)
                  if args.distill_name else None
              ),
              distill_w=args.distill_w)
