"""Training/eval data for the learned tier — frame pairs from the VIDEO PATH.

Round 1 trained on bare synthetic gradients/blobs (train.py's make_batch);
this module renders motion-realistic clips (multi-octave textures, panning
camera, independently moving sprites, hard edges, color ramps — the content
statistics the upscaler actually sees), round-trips them through the y4m
writer/reader (the real `nu_scaler_tpu.capture.video` path, including 4:2:0
chroma subsampling — the dominant video artifact domain), and cuts LR/HR
crop pairs with area downscaling.

Eval reports PSNR/SSIM against the lanczos3 classical tier (not bilinear) on
held-out clips — the bar VERDICT r1 set for the tier that replaces DLSS.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator, List, Tuple

import numpy as np


def _smooth_noise(rng: np.random.Generator, h: int, w: int, octaves: int = 4) -> np.ndarray:
    img = np.zeros((h, w), np.float32)
    for o in range(octaves):
        s = 2 ** (octaves - o)
        small = rng.random((h // s + 2, w // s + 2)).astype(np.float32)
        big = np.kron(small, np.ones((s, s), np.float32))[:h, :w]
        img += big / (o + 1)
    img -= img.min()
    return img / max(img.max(), 1e-6)


def render_clip(
    h: int = 288, w: int = 512, frames: int = 8, seed: int = 0
) -> List[np.ndarray]:
    """Procedural scene: textured background with camera pan + 1-3 moving
    sprites (textured squares / hard-edged bars / smooth discs) + a color
    ramp overlay. Returns `frames` RGBA u8 arrays."""
    rng = np.random.default_rng(seed)
    margin = 48
    canvas = np.stack(
        [_smooth_noise(rng, h + 2 * margin, w + 2 * margin) for _ in range(3)], -1
    )
    # hard detail: scattered edges and thin lines on the canvas
    for _ in range(12):
        y0 = rng.integers(0, h + margin)
        x0 = rng.integers(0, w + margin)
        ln = rng.integers(20, 120)
        col = rng.random(3).astype(np.float32)
        if rng.random() < 0.5:
            canvas[y0, x0 : x0 + ln] = col
        else:
            canvas[y0 : y0 + ln, x0] = col
    vy, vx = int(rng.integers(-2, 3)), int(rng.integers(-3, 4))
    sprites = []
    for _ in range(int(rng.integers(1, 4))):
        size = int(rng.integers(24, 64))
        kind = rng.integers(0, 3)
        if kind == 0:
            tex = np.stack([_smooth_noise(rng, size, size, 3) for _ in range(3)], -1)
        elif kind == 1:  # hard-edged two-tone bar
            tex = np.broadcast_to(rng.random(3).astype(np.float32), (size, size, 3)).copy()
            tex[:, size // 2 :] = rng.random(3).astype(np.float32)
        else:  # smooth disc
            yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
            r = np.hypot(yy - size / 2, xx - size / 2) / (size / 2)
            tex = np.clip(1.0 - r, 0, 1)[..., None] * rng.random(3).astype(np.float32)
        sprites.append(
            dict(
                tex=tex.astype(np.float32),
                y=int(rng.integers(0, h - size)),
                x=int(rng.integers(0, w - size)),
                vy=int(rng.integers(-3, 4)),
                vx=int(rng.integers(-4, 5)),
                size=size,
            )
        )
    ramp = np.linspace(0, 0.15, w, dtype=np.float32)[None, :, None] * rng.random(3)

    out = []
    for k in range(frames):
        oy = margin + k * vy
        ox = margin + k * vx
        view = canvas[oy : oy + h, ox : ox + w].copy()
        for sp in sprites:
            size = sp["size"]
            py = int(np.clip(sp["y"] + k * sp["vy"], 0, h - size))
            px = int(np.clip(sp["x"] + k * sp["vx"], 0, w - size))
            view[py : py + size, px : px + size] = sp["tex"]
        view = np.clip(view + ramp, 0, 1)
        fr = np.empty((h, w, 4), np.uint8)
        fr[..., :3] = (view * 255.0 + 0.5).astype(np.uint8)
        fr[..., 3] = 255
        out.append(fr)
    return out


def clip_through_video_path(frames: List[np.ndarray], path: str | None = None) -> List[np.ndarray]:
    """Round-trip through the y4m writer/reader (4:2:0) — the capture/video
    ingest path the framework actually serves."""
    from nu_scaler_tpu.capture.video import Y4MReader, Y4MWriter

    h, w = frames[0].shape[:2]
    own = path is None
    if own:
        fd, path = tempfile.mkstemp(suffix=".y4m")
        os.close(fd)
    try:
        wtr = Y4MWriter(path, w, h, fps=30.0)
        for f in frames:
            wtr.write(f)
        wtr.close()
        return list(Y4MReader(path))
    finally:
        if own:
            os.unlink(path)


def _area_down(hr: np.ndarray, scale: int) -> np.ndarray:
    h, w = hr.shape[:2]
    v = hr.reshape(h // scale, scale, w // scale, scale, hr.shape[-1])
    return v.mean(axis=(1, 3))


class PairPool:
    """Pre-rendered pool of (lr, hr) RGB crop pairs in [0, 1] f32. Rendering
    goes through the video path once; sampling is then allocation-cheap so
    the TPU step, not host data gen, dominates training."""

    def __init__(
        self,
        rng: np.random.Generator,
        scale: int = 2,
        crop: int = 96,
        n_clips: int = 12,  # 6 → 12: the 6-clip pool overfit past ~40k steps
        frames_per_clip: int = 6,
        pool_size: int = 4096,
        seed0: int = 100,
        down_mix: float = 0.0,
    ):
        """down_mix > 0 diversifies the SOURCE distribution: that fraction of
        the clip pool is rendered at 2× resolution and area-downsampled back
        (supersampled content — cleaner high-frequency statistics than the
        native render, the way downscaled-4K footage differs from native
        1080p). The same native+downsampled mix lifted the MC-refinement
        net at every measured height after its same-distribution fine-tunes
        had saturated (interp_ref4 64k, CLAUDE.md) — the analogous lever for
        the SR trunk's step-saturated recipe (TODO r3 session-3)."""
        self.scale = scale
        self.crop = crop
        frames: List[np.ndarray] = []
        n_down = int(round(n_clips * down_mix))
        for c in range(n_clips):
            if c < n_down:
                hi = render_clip(h=576, w=1024, seed=seed0 + c,
                                 frames=frames_per_clip)
                clip = [
                    np.concatenate(
                        [
                            np.clip(
                                np.round(_area_down(
                                    f[..., :3].astype(np.float32), 2
                                )), 0, 255,
                            ).astype(np.uint8),
                            np.full((288, 512, 1), 255, np.uint8),
                        ],
                        axis=-1,
                    )
                    for f in hi
                ]
            else:
                clip = render_clip(seed=seed0 + c, frames=frames_per_clip)
            frames.extend(clip_through_video_path(clip))
        hrs = np.empty((pool_size, crop, crop, 3), np.float32)
        lrs = np.empty((pool_size, crop // scale, crop // scale, 3), np.float32)
        for i in range(pool_size):
            f = frames[rng.integers(0, len(frames))]
            y = rng.integers(0, f.shape[0] - crop + 1)
            x = rng.integers(0, f.shape[1] - crop + 1)
            hr = f[y : y + crop, x : x + crop, :3].astype(np.float32) / 255.0
            hrs[i] = hr
            lrs[i] = _area_down(hr, scale)
        self.hrs, self.lrs = hrs, lrs

    def batch(self, rng: np.random.Generator, n: int) -> Tuple[np.ndarray, np.ndarray]:
        idx = rng.integers(0, self.hrs.shape[0], size=n)
        return self.lrs[idx], self.hrs[idx]


def eval_vs_lanczos3(
    apply_fn, scale: int = 2, seeds=(900, 901, 902), crop: int = 192
) -> dict:
    """Held-out clips (seeds disjoint from training): PSNR/SSIM of the net
    vs the lanczos3 classical tier on the same LR inputs.

    apply_fn: f32 RGB [N, h, w, 3] in [0,1] → [N, h*scale, w*scale, 3]."""
    import jax.numpy as jnp

    from nu_scaler_tpu.ops.metrics import psnr, ssim
    from nu_scaler_tpu.ops.resample import make_resampler

    rng = np.random.default_rng(0)
    net_p, net_s, lan_p, lan_s = [], [], [], []
    for seed in seeds:
        frames = clip_through_video_path(render_clip(seed=seed, frames=2))
        for f in frames:
            y = rng.integers(0, f.shape[0] - crop + 1)
            x = rng.integers(0, f.shape[1] - crop + 1)
            hr_u8 = f[y : y + crop, x : x + crop]  # RGBA
            hr = hr_u8[..., :3].astype(np.float32) / 255.0
            lr = _area_down(hr, scale)
            out = np.asarray(apply_fn(jnp.asarray(lr[None])))[0]
            out_u8 = np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)
            hr_rgb = hr_u8[..., :3]
            net_p.append(psnr(out_u8, hr_rgb))
            net_s.append(ssim(out_u8, hr_rgb))

            lr_u8 = np.empty(lr.shape[:2] + (4,), np.uint8)
            lr_u8[..., :3] = np.clip(np.round(lr * 255.0), 0, 255).astype(np.uint8)
            lr_u8[..., 3] = 255
            up = make_resampler(lr.shape[0], lr.shape[1], crop, crop, "lanczos3", "highest")
            lan = np.asarray(up(jnp.asarray(lr_u8)))[..., :3]
            lan_p.append(psnr(lan, hr_rgb))
            lan_s.append(ssim(lan, hr_rgb))
    return {
        "net_psnr_db": float(np.mean(net_p)),
        "net_ssim": float(np.mean(net_s)),
        "lanczos3_psnr_db": float(np.mean(lan_p)),
        "lanczos3_ssim": float(np.mean(lan_s)),
        "psnr_delta_db": float(np.mean(net_p) - np.mean(lan_p)),
        "ssim_delta": float(np.mean(net_s) - np.mean(lan_s)),
    }


def eval_interp_refinement(
    seeds=(900, 901), frames: int = 5, height: int = 1080, width: int = 1920
) -> dict:
    """Held-out mid-frame quality of the learned MC refinement vs the plain
    production soft warp: predict each clip's odd frames from their even
    neighbors, score PSNR/SSIM against the true middle frame, both modes.
    Seeds 900+ are disjoint from the refinement pool's training seeds 100..
    (interp_refine.TripletPool)."""
    import jax.numpy as jnp

    from nu_scaler_tpu.ops.interpolate import make_interpolator
    from nu_scaler_tpu.ops.metrics import psnr, ssim

    soft_fn = make_interpolator(height, width, "flow_soft")
    ref_fn = make_interpolator(height, width, "flow_soft_ref")
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
            ref = np.asarray(ref_fn(a, b, 0.5))
            soft_p.append(psnr(soft, truth))
            soft_s.append(ssim(soft, truth))
            ref_p.append(psnr(ref, truth))
            ref_s.append(ssim(ref, truth))
    return {
        "soft_psnr_db": float(np.mean(soft_p)),
        "soft_ssim": float(np.mean(soft_s)),
        "ref_psnr_db": float(np.mean(ref_p)),
        "ref_ssim": float(np.mean(ref_s)),
        "psnr_delta_db": float(np.mean(ref_p) - np.mean(soft_p)),
        "ssim_delta": float(np.mean(ref_s) - np.mean(soft_s)),
    }
