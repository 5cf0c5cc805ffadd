"""Training + checkpointing for the ESRGAN-lite learned tier.

Replaces the role of the vendor-SDK "quality" path (dlss-sys / fsr3-sys,
SURVEY C11/C12) with something that actually trains: self-supervised
super-resolution on downscaled crops of whatever frames the capture path
produces (synthetic scenes by default — no dataset download needed).

Checkpoints go through orbax (`checkpoints/esrgan_lite_s{stages}`), and
`load_or_init` restores them so `make_pretrained_upscaler` serves trained
weights across processes. Multi-chip training uses the dp×tp sharded step
from `esrgan_lite.make_sharded_train_step`.

Run:  python -m nu_scaler_tpu.models.train --steps 200 --batch 8
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nu_scaler_tpu.models import esrgan_lite as el

CKPT_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "checkpoints")


def ckpt_dir(stages: int, arch: str = "lite") -> str:
    if arch.startswith("tpu"):
        return os.path.join(CKPT_ROOT, f"esrgan_{arch}_x{2**stages}")
    return os.path.join(CKPT_ROOT, f"esrgan_lite_s{stages}")


def save_checkpoint(params, stages: int, step: int, arch: str = "lite") -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir(stages, arch))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, str(step)), params, force=True)
    # update the "latest" pointer
    with open(os.path.join(path, "latest.txt"), "w") as f:
        f.write(str(step))
    return path


def load_checkpoint(stages: int, arch: str = "lite"):
    """Returns (params, step) or None."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir(stages, arch))
    latest = os.path.join(path, "latest.txt")
    if not os.path.exists(latest):
        return None
    step = int(open(latest).read().strip())
    ckptr = ocp.PyTreeCheckpointer()
    params = ckptr.restore(os.path.join(path, str(step)))
    return params, step


def save_act_scales(scales: dict, stages: int, step: int, arch: str) -> str:
    """Persist int8 calibration (per-conv-input activation maxima,
    `esrgan_lite.default_trunk_scales`) next to the checkpoint it was
    calibrated against, so serving can load the int8 trunk without
    re-rendering calibration clips."""
    import json

    path = os.path.join(os.path.abspath(ckpt_dir(stages, arch)), "act_scales.json")
    with open(path, "w") as f:
        json.dump({"step": step, "scales": scales}, f, indent=1)
    return path


def load_act_scales(stages: int, arch: str, step: int | None = None):
    """int8 activation scales for the checkpoint, or None when absent or
    calibrated against a different step than the one being served."""
    import json

    path = os.path.join(os.path.abspath(ckpt_dir(stages, arch)), "act_scales.json")
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


def save_opt_state(opt_state, stages: int, step: int, arch: str = "lite") -> None:
    """Optimizer moments alongside the params (resume keeps Adam state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir(stages, arch))
    ocp.PyTreeCheckpointer().save(
        os.path.join(path, f"{step}_opt"), jax.device_get(opt_state), force=True
    )


def load_opt_state(opt_template, stages: int, step: int, arch: str = "lite"):
    """Restore optimizer state into the given template structure; None when
    absent or incompatible (e.g. the checkpoint predates opt-state saving)."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir(stages, arch)), f"{step}_opt")
    if not os.path.exists(path):
        return None
    try:
        return ocp.PyTreeCheckpointer().restore(path, item=opt_template)
    except Exception:  # noqa: BLE001 — structure drift: re-init instead
        return None


def load_or_init(stages: int):
    """Checkpoint-or-init; also primes the in-memory serving cache."""
    restored = load_checkpoint(stages)
    if restored is not None:
        params, _ = restored
        el.set_params(stages, params)
        return params
    _, params = el.init_params(0, stages)
    return params


# ---------------------------------------------------------------------------
# Synthetic SR data: random mixtures of gradients, blobs and edges
# ---------------------------------------------------------------------------


def make_batch(rng: np.random.Generator, batch: int, size: int = 64, scale: int = 2):
    """HR [N, size, size, 3] in [0,1] + LR `scale`x-downscaled (area)."""
    n = batch
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    hr = np.empty((n, size, size, 3), np.float32)
    for i in range(n):
        img = np.zeros((size, size, 3), np.float32)
        # gradient base
        a, b = rng.random(2)
        img += (a * xx + b * yy)[..., None] * rng.random(3)
        # blobs
        for _ in range(rng.integers(1, 4)):
            cx, cy = rng.random(2) * size
            s = 2 + rng.random() * 10
            blob = np.exp(-(((np.arange(size) - cx) / s) ** 2))[None, :] * np.exp(
                -(((np.arange(size) - cy) / s) ** 2)
            )[:, None]
            img += blob[..., None] * rng.random(3)
        # hard edge
        if rng.random() < 0.7:
            pos = rng.integers(4, size - 4)
            if rng.random() < 0.5:
                img[:, pos:] += rng.random(3) * 0.5
            else:
                img[pos:, :] += rng.random(3) * 0.5
        hr[i] = np.clip(img / max(img.max(), 1e-3), 0, 1)
    v = hr.reshape(n, size // scale, scale, size // scale, scale, 3)
    lr = v.mean(axis=(2, 4))
    return lr, hr


def make_model(arch: str, stages: int):
    if arch == "tpu":
        model = el.ESRGANLiteTPU(upscale=2**stages)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        return model, params
    if arch == "tpu4":
        # trunk at 1/4 res with 128 channels: 28.9% of MXU peak per conv vs
        # 5.2% at 1/2-res/64ch (tools/experiments/conv_sweep.py)
        model = el.ESRGANLiteTPU(upscale=2**stages, stride=4, features=128)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        return model, params
    if arch == "tpu4b2":
        # tpu4 with blocks=2: one residual block fewer (~0.35 ms of the
        # serving frame) — the r3 speed/quality trade candidate for clearing
        # the 240 fps target with margin
        model = el.ESRGANLiteTPU(upscale=2**stages, stride=4, features=128, blocks=2)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        return model, params
    if arch == "tpu4b1":
        # tpu4 with a SINGLE residual block: two convs fewer than tpu4b2
        # (~0.6 ms of the 4.16 ms serving frame → ~280 fps) — the r3 lever
        # for clearing the 240 fps gate with real margin instead of the
        # coin-flip 239.8-241.4 band tpu4b2 sits in. Served only if the
        # held-out quality stays ≥ +4 dB vs lanczos3.
        model = el.ESRGANLiteTPU(upscale=2**stages, stride=4, features=128, blocks=1)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        return model, params
    if arch == "tpu8":
        # trunk at 1/8 res (135p), 128 channels, sparse fixed base: the
        # fastest end-to-end serving config of tools/esrgan_arch_sweep.py
        # (4.02 ms/frame = 249 fps at 1080p→4K vs tpu4's 6.6 ms). Held-out
        # quality is only lanczos3-level (+0.03 dB, −0.028 SSIM after 20k
        # steps — the 128-wide trunk bottlenecks the 192-dim s2d input), so
        # this arch serves the "performance" learned tier, not the default.
        model = el.ESRGANLiteTPU(upscale=2**stages, stride=8, features=128)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        return model, params
    if arch == "tpu8w":
        # stride-8 trunk WITHOUT the channel bottleneck (C=192 matches the
        # s2d input width): 5.0 ms serving (200 fps) in the arch sweep
        model = el.ESRGANLiteTPU(upscale=2**stages, stride=8, features=192)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
        )
        return model, params
    return el.init_params(0, stages)


def make_distill_step(model, optimizer, loss_kind: str, w: float):
    """Two-term distillation step: (1-w)·loss(student, HR) + w·loss(student,
    teacher(LR)). Teacher outputs are precomputed per pool entry (the teacher
    is frozen), so the step only takes an extra target batch."""
    base = el.l1_grad_loss if loss_kind == "l1_grad" else el.l1_loss

    @jax.jit
    def step(params, opt_state, lr_b, hr_b, t_b):
        def lf(p):
            return (1.0 - w) * base(model, p, lr_b, hr_b) + w * base(
                model, p, lr_b, t_b
            )

        lv, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, lv

    return step


def teacher_outputs(teacher_arch: str, stages: int, lrs: np.ndarray) -> np.ndarray:
    """Frozen-teacher predictions for every pool LR crop, batched forward."""
    model, params = make_model(teacher_arch, stages)
    restored = load_checkpoint(stages, teacher_arch)
    if restored is None:
        raise ValueError(f"no checkpoint for teacher arch {teacher_arch!r}")
    params, step = restored
    print(f"distilling from {teacher_arch}@{step}", flush=True)
    fn = jax.jit(lambda x: model.apply(params, x))
    outs = []
    bs = 64
    for i in range(0, lrs.shape[0], bs):
        outs.append(np.asarray(fn(jnp.asarray(lrs[i : i + bs]))))
    return np.concatenate(outs, axis=0)


def train(
    steps: int = 200,
    batch: int = 8,
    stages: int = 1,
    lr: float = 2e-4,
    seed: int = 0,
    log_every: int = 25,
    save: bool = True,
    arch: str = "lite",
    data: str = "video",
    crop: int = 96,
    loss_kind: str = "l1",
    n_clips: int = 12,
    pool_size: int = 4096,
    distill: str | None = None,
    distill_w: float = 0.5,
    down_mix: float = 0.0,
) -> float:
    """Returns final loss. data: "video" (clip pairs through the y4m path —
    the production domain) | "synthetic" (round-1 gradients/blobs).

    distill: teacher arch name — adds w·loss(student, teacher(LR)) with
    precomputed frozen-teacher targets over the pool (video data only)."""
    rng = np.random.default_rng(seed)
    model, params = make_model(arch, stages)
    start = 0
    restored = load_checkpoint(stages, arch)
    if restored is not None:
        params, start = restored
        print(f"resumed from step {start}")
    elif arch in ("tpu4b2", "tpu4b1"):
        # warm start from the trained next-deeper checkpoint: identical
        # structure minus the last residual block (head/blocks/trunk/tail
        # shapes match), so the net starts near the deeper optimum instead
        # of from scratch
        donor = load_checkpoint(stages, "tpu4b2" if arch == "tpu4b1" else "tpu4")
        if donor is None and arch == "tpu4b1":
            donor = load_checkpoint(stages, "tpu4")
        if donor is not None:
            dp = donor[0]["params"] if "params" in donor[0] else donor[0]
            wp = params["params"] if "params" in params else params
            for name in wp:
                if name in dp:
                    wp[name] = jax.tree_util.tree_map(
                        lambda a: jnp.asarray(np.asarray(a)), dp[name]
                    )
            print(f"warm-started for {arch} from donor step {donor[1]} "
                  "(last block dropped)")
    opt = optax.adam(lr)
    if distill is not None:
        step_fn = make_distill_step(model, opt, loss_kind, distill_w)
    else:
        step_fn = el.make_train_step(model, opt, loss_kind)
    opt_state = opt.init(params)
    if restored is not None:
        prev = load_opt_state(opt_state, stages, start, arch)
        if prev is not None:
            opt_state = prev
            print("restored optimizer state")

    pool = None
    touts = None
    if data == "video":
        from nu_scaler_tpu.models.data import PairPool

        print("rendering clip pool (video path)...", flush=True)
        pool = PairPool(rng, scale=2**stages, crop=crop, n_clips=n_clips,
                        pool_size=pool_size, down_mix=down_mix)
        if distill is not None:
            touts = teacher_outputs(distill, stages, pool.lrs)
    elif distill is not None:
        raise ValueError("distillation needs data='video' (pooled crops)")

    loss = float("nan")
    t0 = time.time()
    for step in range(steps):
        if pool is not None:
            idx = rng.integers(0, pool.hrs.shape[0], size=batch)
            lr_b, hr_b = pool.lrs[idx], pool.hrs[idx]
        else:
            lr_b, hr_b = make_batch(rng, batch, scale=2**stages)
        if touts is not None:
            params, opt_state, loss = step_fn(
                params, opt_state, jnp.asarray(lr_b), jnp.asarray(hr_b),
                jnp.asarray(touts[idx]),
            )
        else:
            params, opt_state, loss = step_fn(params, opt_state, jnp.asarray(lr_b), jnp.asarray(hr_b))
        if step % log_every == 0:
            print(f"step {step:5d}  loss {float(loss):.5f}  ({time.time()-t0:.1f}s)", flush=True)
    print(f"final loss {float(loss):.5f}")
    if save:
        # checkpoint number = total training steps, not this run's count
        # (resume from N + M steps saves as N+M, so latest never regresses)
        path = save_checkpoint(jax.device_get(params), stages, start + steps, arch)
        save_opt_state(opt_state, stages, start + steps, arch)
        print(f"checkpoint: {path}")
    if arch == "lite":
        el.set_params(stages, params)
    return float(loss)


def evaluate(stages: int = 1, arch: str = "tpu") -> dict:
    """Held-out PSNR/SSIM vs the lanczos3 classical tier (VERDICT r1 #3)."""
    from nu_scaler_tpu.models.data import eval_vs_lanczos3

    model, params = make_model(arch, stages)
    restored = load_checkpoint(stages, arch)
    if restored is not None:
        params, step = restored
        print(f"evaluating checkpoint step {step}")
    fn = jax.jit(lambda x: model.apply(params, x))
    scores = eval_vs_lanczos3(fn, scale=2**stages)
    for k, v in scores.items():
        print(f"  {k}: {v:.4f}")
    return scores


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--stages", type=int, default=1)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument(
        "--arch", default="lite",
        choices=["lite", "tpu", "tpu4", "tpu4b2", "tpu4b1", "tpu8", "tpu8w"],
    )
    p.add_argument("--data", default="video", choices=["video", "synthetic"])
    p.add_argument("--crop", type=int, default=96)
    p.add_argument("--loss", default="l1", choices=["l1", "l1_grad"])
    p.add_argument("--clips", type=int, default=12, help="clip-pool width "
                   "(seeds 100..100+N-1; eval seeds 900+ stay held out)")
    p.add_argument("--pool", type=int, default=4096, help="crop-pool size")
    p.add_argument("--distill", default=None, help="teacher arch to distill "
                   "from (e.g. tpu4); adds w*loss(student, teacher(LR))")
    p.add_argument("--distill-w", type=float, default=0.5)
    p.add_argument("--down-mix", type=float, default=0.0, help="fraction of "
                   "the clip pool rendered at 2x and area-downsampled "
                   "(source-distribution diversity, see PairPool)")
    p.add_argument("--seed", type=int, default=0, help="numpy seed for the "
                   "pool draw + batch order (fresh draws per fine-tune leg)")
    p.add_argument("--eval", action="store_true", help="evaluate the latest "
                   "checkpoint vs lanczos3 on held-out clips and exit")
    p.add_argument("--calibrate", action="store_true", help="calibrate int8 "
                   "activation scales for the latest checkpoint (training "
                   "clips only) and save act_scales.json next to it")
    p.add_argument("--io", action="store_true", help="with --calibrate: also "
                   "write head/base io-int8 entries (lane-filled @128 int8 "
                   "head+base convs — the 312-fps tpu4b2 serving point)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend "
                   "(the site config pins JAX_PLATFORMS=axon; env vars alone "
                   "don't override it)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.calibrate:
        model, _ = make_model(args.arch, args.stages)
        restored = load_checkpoint(args.stages, args.arch)
        if restored is None:
            raise SystemExit(f"no checkpoint for {args.arch}")
        params, step = restored
        scales = el.default_trunk_scales(model, params)
        if args.io:
            # head/base io-int8 entries: normalized-domain input maxima
            # (u8 frames are exact 0..255 → 1.0 normalized; serving
            # multiplies by 255). Only pays lane-filled: the serving
            # builder pads both convs to 128 input lanes
            # (esrgan_surgery7.py / tools/experiments/io128 probe r4:
            # tpu4b2 3.531 → 3.204 ms for −0.15 dB held-out)
            scales["head"] = 1.0
            scales["base"] = 1.0
        path = save_act_scales(scales, args.stages, step, args.arch)
        print(f"{args.arch}@{step} int8 scales → {path}")
        for k, v in scales.items():
            print(f"  {k}: {v:.4f}")
    elif args.eval:
        evaluate(args.stages, args.arch)
    else:
        train(args.steps, args.batch, args.stages, args.lr, seed=args.seed,
              arch=args.arch,
              data=args.data, crop=args.crop, loss_kind=args.loss,
              n_clips=args.clips, pool_size=args.pool,
              distill=args.distill, distill_w=args.distill_w,
              down_mix=args.down_mix)
