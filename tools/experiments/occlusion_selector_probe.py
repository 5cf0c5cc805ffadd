"""Achievable occlusion gain (not the oracle): tile-level selectors.

occlusion_oracle_probe.py measured a +3.8-5.0 dB per-pixel oracle ceiling
over the fixed (1−t, t) mix. This probe scores COMPUTABLE selectors at the
warp's natural tile granularity:

  * tile-oracle: per-tile best of {A, B, mix} (the granularity ceiling —
    what a per-tile weight field folded into the soft warp's corner blend
    could at most achieve)
  * fwd-bwd: forward-backward flow consistency — tiles where
    d_ab(T) + d_ba(T + d_ab) is large are occluded; pick the side whose
    own-flow round trip is more consistent, else mix.

Run: PYTHONPATH=/root/.axon_site:/root/repo python ... (CPU, 288p)."""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nu_scaler_tpu.models.data import clip_through_video_path, render_clip
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops.metrics import psnr

    t = 0.5
    th, tw = 8, 64  # probe tile (288p → 36×8 tiles)

    def tile_mean(f, th_, tw_):
        h, w = f.shape[:2]
        return f[: h - h % th_, : w - w % tw_].reshape(
            h // th_, th_, w // tw_, tw_, -1
        ).mean((1, 3))

    for seed in (900, 901):
        clip = clip_through_video_path(render_clip(288, 512, frames=3, seed=seed))
        a, truth, b = clip[0], clip[1], clip[2]
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        fab = np.asarray(I.compute_flow_fast(aj, bj))
        fba = np.asarray(I.compute_flow_fast(bj, aj))

        ap = aj[..., :3].astype(jnp.float32).transpose(2, 0, 1)
        bp = bj[..., :3].astype(jnp.float32).transpose(2, 0, 1)
        wa = np.asarray(I.block_warp_planar(ap, jnp.asarray(fab) * -t)).transpose(1, 2, 0)
        wb = np.asarray(
            I.block_warp_planar(bp, jnp.asarray(fab) * (1.0 - t))
        ).transpose(1, 2, 0)
        tr = truth[..., :3].astype(np.float64)
        mix = 0.5 * (wa + wb)

        h, w = tr.shape[:2]
        ty, tx = h // th, w // tw
        cands = np.stack([wa, wb, mix])

        # tile-granularity oracle
        err = np.abs(cands - tr[None]).sum(-1)  # [3, H, W]
        terr = err[:, : ty * th, : tx * tw].reshape(3, ty, th, tx, tw).sum((2, 4))
        tpick = terr.argmin(0)  # [ty, tx]
        pick_px = np.repeat(np.repeat(tpick, th, 0), tw, 1)
        orac = np.take_along_axis(cands, pick_px[None, ..., None], 0)[0]

        # computable: fwd-bwd consistency per tile
        dab = tile_mean(fab, th, tw)  # [ty, tx, 2] px units (y, x? -> see flow layout)
        dba = tile_mean(fba, th, tw)
        # round trip: where does tile T land in B, and what does B's flow say
        yy, xx = np.mgrid[0:ty, 0:tx]
        ly = np.clip(yy + np.round(dab[..., 0] / th).astype(int), 0, ty - 1)
        lx = np.clip(xx + np.round(dab[..., 1] / tw).astype(int), 0, tx - 1)
        rt = dab + dba[ly, lx]  # ≈ 0 where consistent
        inc = np.linalg.norm(rt, axis=-1)  # inconsistency magnitude (px)
        occ = inc > max(2.0, 0.25 * np.median(np.linalg.norm(dab, axis=-1)))
        # in occluded tiles choose the side whose source is "still there":
        # disocclusion from A (content appears) → B carries it, and vice
        # versa; proxy: compare each side's warp against the cross-fade of
        # the sources (ghost-free side matches its own source better)
        sa = np.abs(wa - a[..., :3].astype(np.float64))[: ty * th, : tx * tw]
        sb = np.abs(wb - b[..., :3].astype(np.float64))[: ty * th, : tx * tw]
        sa_t = sa.reshape(ty, th, tx, tw, 3).sum((1, 3, 4))
        sb_t = sb.reshape(ty, th, tx, tw, 3).sum((1, 3, 4))
        side = np.where(sa_t < sb_t, 0, 1)
        comp_pick = np.where(occ, side, 2)
        comp_px = np.repeat(np.repeat(comp_pick, th, 0), tw, 1)
        comp = np.take_along_axis(cands, comp_px[None, ..., None], 0)[0]

        print(f"seed {seed}:  mix {psnr(mix, tr):6.2f}  "
              f"tile-oracle {psnr(orac, tr):6.2f} (+{psnr(orac, tr)-psnr(mix, tr):.2f})  "
              f"fwd-bwd {psnr(comp, tr):6.2f} ({psnr(comp, tr)-psnr(mix, tr):+.2f})  "
              f"occ tiles {occ.mean():.2%}", flush=True)


if __name__ == "__main__":
    main()


def perpixel() -> None:
    """Per-pixel computable selector: fwd-bwd consistency fields via block
    warps of the FLOW fields (elementwise after the warp — no gathers), vs
    the per-pixel oracle's +3.8-5.0 dB ceiling."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nu_scaler_tpu.models.data import clip_through_video_path, render_clip
    from nu_scaler_tpu.ops import interpolate as I
    from nu_scaler_tpu.ops.metrics import psnr

    t = 0.5
    for seed in (900, 901):
        clip = clip_through_video_path(render_clip(288, 512, frames=3, seed=seed))
        a, truth, b = clip[0], clip[1], clip[2]
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        fab = I.compute_flow_fast(aj, bj)
        fba = I.compute_flow_fast(bj, aj)

        ap = aj[..., :3].astype(jnp.float32).transpose(2, 0, 1)
        bp = bj[..., :3].astype(jnp.float32).transpose(2, 0, 1)
        wa = np.asarray(I.block_warp_planar(ap, fab * -t)).transpose(1, 2, 0)
        wb = np.asarray(I.block_warp_planar(bp, fab * (1.0 - t))).transpose(1, 2, 0)
        tr = truth[..., :3].astype(np.float64)
        mix = 0.5 * (wa + wb)

        # consistency of the A side at the MID position: sample fba where the
        # A content lands (p shifted by −t·fab ≈ the same warp wa used), then
        # fab + fba∘warp should cancel where A's motion is trustworthy
        fba_p = jnp.transpose(fba, (2, 0, 1))
        fab_p = jnp.transpose(fab, (2, 0, 1))
        fba_at_a = np.asarray(I.block_warp_planar(fba_p, fab * (1.0 - t))).transpose(1, 2, 0)
        fab_at_b = np.asarray(I.block_warp_planar(fab_p, fab * -t)).transpose(1, 2, 0)
        inc_a = np.linalg.norm(np.asarray(fab) + fba_at_a, axis=-1)
        inc_b = np.linalg.norm(np.asarray(fba) + fab_at_b, axis=-1)

        # weights: trust each side inversely to its inconsistency (softmax-ish)
        ea = inc_a + 0.5
        eb = inc_b + 0.5
        w_a = eb / (ea + eb)
        sel = w_a[..., None] * wa + (1.0 - w_a[..., None]) * wb

        # hard per-pixel variant with a disagreement gate
        dis = np.abs(wa - wb).sum(-1)
        gate = dis > 20.0
        hard = np.where((inc_a < inc_b)[..., None], wa, wb)
        sel_hard = np.where(gate[..., None], hard, mix)

        print(
            f"seed {seed}: mix {psnr(mix, tr):6.2f}  soft-sel {psnr(sel, tr):6.2f} "
            f"({psnr(sel, tr)-psnr(mix, tr):+.2f})  hard-gated {psnr(sel_hard, tr):6.2f} "
            f"({psnr(sel_hard, tr)-psnr(mix, tr):+.2f})  gated px {gate.mean():.2%}",
            flush=True,
        )


if __name__ == "__main__" and os.environ.get("OCC_PERPIXEL"):
    perpixel()
