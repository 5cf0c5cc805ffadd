"""Device-mesh parallelism.

The reference's only parallel axis is rayon `par_iter` over a frame batch
(`upscale/mod.rs:609-640`) plus thread pipelines (SURVEY §2.6). The TPU-native
equivalents built here:

  * **dp** (data parallel): frames sharded over the mesh `batch` axis —
    `shard_batch_resampler`. Collective-free; each chip upscales its shard.
  * **sp** (spatial parallel): one frame's output rows sharded over chips —
    `shard_spatial_resampler`. The input is replicated (it is the small side:
    1080p in vs 4K out); each chip computes its row-block of the vertical
    contraction then the full horizontal contraction locally — no per-step
    collectives ride ICI at all, only the initial broadcast.
  * the learned tier trains with dp × tp sharding — see
    `nu_scaler_tpu/models/esrgan_lite.py`.

pp/ep do not apply to this domain (no layer pipeline, no experts); SURVEY
§2.6 records that honestly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nu_scaler_tpu.ops import resample as _resample


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_2d_mesh(data: int, model: int) -> Mesh:
    devs = np.array(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


@functools.lru_cache(maxsize=64)
def shard_batch_resampler(
    mesh_key, in_h: int, in_w: int, out_h: int, out_w: int, algorithm: str
):
    """Batched resampler with the batch dim sharded over the mesh.

    `mesh_key` is the Mesh (hashable in JAX >= 0.4); frames [N, H, W, 4] must
    have N divisible by the mesh size.
    """
    mesh = mesh_key
    fn = _resample.make_resampler(in_h, in_w, out_h, out_w, algorithm)
    in_sharding = NamedSharding(mesh, P("batch"))
    out_sharding = NamedSharding(mesh, P("batch"))
    return jax.jit(lambda x: fn(x), in_shardings=in_sharding, out_shardings=out_sharding)


def upscale_batch_sharded(
    frames: np.ndarray, out_h: int, out_w: int, algorithm: str, mesh: Mesh | None = None
) -> jax.Array:
    """Upscale [N, H, W, 4] frames data-parallel across the mesh — the
    TPU-native `upscale_batch` (rayon replacement)."""
    if mesh is None:
        mesh = make_mesh()
    n = frames.shape[0]
    size = mesh.devices.size
    pad = (-n) % size
    if pad:
        frames = np.concatenate([frames, np.repeat(frames[-1:], pad, axis=0)])
    fn = shard_batch_resampler(
        mesh, frames.shape[1], frames.shape[2], out_h, out_w, algorithm
    )
    out = fn(jnp.asarray(frames))
    return out[:n] if pad else out


@functools.lru_cache(maxsize=64)
def shard_spatial_resampler(
    mesh_key, in_h: int, in_w: int, out_h: int, out_w: int, algorithm: str
):
    """Single-frame resample with output rows sharded across chips (sp).

    shard_map over the `batch` axis reused as a row axis: chip k computes
    output rows [k*OH/D, (k+1)*OH/D) from the replicated input. The vertical
    weight matrix is sharded by rows; the horizontal one is replicated.
    """
    shard_map = jax.shard_map

    mesh = mesh_key
    algorithm = _resample.normalize_algorithm(algorithm)
    ndev = mesh.devices.size
    if out_h % ndev:
        raise ValueError(f"out_h {out_h} not divisible by mesh size {ndev}")
    # every algorithm (incl. nearest/bilinear with their WGSL alignment) has a
    # weight matrix; shard its rows so each chip computes its output-row block
    wv = jnp.asarray(_resample._axis_weights(in_h, out_h, algorithm))
    wh = jnp.asarray(_resample._axis_weights(in_w, out_w, algorithm))

    def body(wv_shard, img):
        f = img.astype(jnp.float32) * (1.0 / 255.0)
        tmp = jnp.einsum("oi,iwc->owc", wv_shard, f, precision=jax.lax.Precision.HIGHEST)
        out = jnp.einsum("pw,owc->opc", wh, tmp, precision=jax.lax.Precision.HIGHEST)
        return jnp.trunc(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("batch", None), P()),
        out_specs=P("batch"),
    )
    return jax.jit(lambda img: sharded(wv, img))


def upscale_frame_spatial(
    frame: np.ndarray, out_h: int, out_w: int, algorithm: str, mesh: Mesh | None = None
) -> jax.Array:
    if mesh is None:
        mesh = make_mesh()
    fn = shard_spatial_resampler(
        mesh, frame.shape[0], frame.shape[1], out_h, out_w, algorithm
    )
    return fn(jnp.asarray(frame))


def interpolate_batch_sharded(
    pairs_a: np.ndarray,
    pairs_b: np.ndarray,
    time_t: float = 0.5,
    mode: str = "flow",
    mesh: Mesh | None = None,
    levels: int = 2,
) -> jax.Array:
    """Motion-compensated interpolation over a BATCH of frame pairs, data
    parallel across the mesh (the 30→60 fps batch-transcode shape): each chip
    runs the full gather-free flow+warp pipeline on its shard of pairs.
    Collective-free, like `upscale_batch_sharded`. Ragged batches are padded
    to a mesh-size multiple and the result sliced back (same contract as
    `upscale_batch_sharded`).

    pairs_a/pairs_b: u8 [N, H, W, 4].
    mode: "blend" | "flow" | "flow_soft" (the overlapped-tile warp) |
    "flow_soft_ref" (+ the learned refinement net on each chip's mids —
    dp shards hold complete frames, so the raw-domain selector-matmul
    serving graph applies per frame, unlike the sp row-sharded path).
    """
    shard_map = jax.shard_map

    from nu_scaler_tpu.ops import interpolate as _interp

    if mesh is None:
        mesh = make_mesh()
    n = pairs_a.shape[0]
    size = mesh.devices.size
    pad = (-n) % size
    if pad:
        pairs_a = np.concatenate([pairs_a, np.repeat(pairs_a[-1:], pad, axis=0)])
        pairs_b = np.concatenate([pairs_b, np.repeat(pairs_b[-1:], pad, axis=0)])

    refine = None
    if mode == "flow_soft_ref":
        from nu_scaler_tpu.models.interp_refine import get_refine_graph

        h_, w_ = int(pairs_a.shape[1]), int(pairs_a.shape[2])
        if _interp.refine_serves(h_, w_):
            refine = get_refine_graph(h_, w_)
        if refine is None:
            raise ValueError(
                "flow_soft_ref needs a trained interp_ref4 checkpoint, H/W "
                "divisible by the net stride, and height inside the net's "
                f"serving band (>= {_interp.REFINE_MIN_ROWS} rows — the "
                "1080p-trained net loses below it, BASELINE.md)"
            )

    def one(a, b):
        if mode == "blend":
            return _interp.blend_only(a, b, time_t)
        flow = _interp.compute_flow_fast(a, b, levels=levels)
        mid = _interp.warp_blend_fast(
            a, b, flow, time_t,
            overlap=mode in ("flow_soft", "flow_soft_ref"),
        )
        return mid if refine is None else refine(a, b, mid)

    def body(a_shard, b_shard):
        # lax.map (not vmap) so each frame keeps the single-frame gather-free
        # program: vmap would batch the data-dependent top_k candidate offsets
        # and turn the warp's dynamic_slice slab extraction into XLA gathers
        # (8-20 ms/frame on this backend — CLAUDE.md).
        return jax.lax.map(lambda ab: one(ab[0], ab[1]), (a_shard, b_shard))

    sharded = shard_map(
        body, mesh=mesh, in_specs=(P("batch"), P("batch")), out_specs=P("batch")
    )
    out = jax.jit(sharded)(jnp.asarray(pairs_a), jnp.asarray(pairs_b))
    return out[:n] if pad else out


def fsr_batch_sharded(
    frames: np.ndarray,
    out_h: int,
    out_w: int,
    quality: str = "quality",
    mesh: Mesh | None = None,
) -> jax.Array:
    """FSR (EASU+RCAS) over a batch of frames, data parallel across the mesh
    — each chip runs the fused phase pipeline on its shard. Collective-free.
    Ragged batches are padded to a mesh-size multiple and sliced back.

    frames: u8 [N, H, W, 4]."""
    shard_map = jax.shard_map

    from nu_scaler_tpu.ops import fsr as _fsr

    if mesh is None:
        mesh = make_mesh()
    n, in_h, in_w = frames.shape[0], frames.shape[1], frames.shape[2]
    size = mesh.devices.size
    pad = (-n) % size
    if pad:
        frames = np.concatenate([frames, np.repeat(frames[-1:], pad, axis=0)])
    fn = _fsr.make_fsr_upscaler(in_h, in_w, out_h, out_w, quality)
    # sequential map of the single-frame program per shard (the measured-best
    # batch strategy for FSR — see ops/fsr._fused_phase_pipeline)
    sharded = shard_map(
        lambda x: jax.lax.map(fn, x),
        mesh=mesh,
        in_specs=(P("batch"),),
        out_specs=P("batch"),
    )
    out = jax.jit(sharded)(jnp.asarray(frames))
    return out[:n] if pad else out


@functools.lru_cache(maxsize=16)
def _spatial_fsr_fn(mesh_key, in_h: int, in_w: int, out_h: int, out_w: int,
                    quality: str, axis: str):
    from nu_scaler_tpu.ops import fsr as _fsr

    mesh = mesh_key
    sh_in = NamedSharding(mesh, P(axis, None, None))
    sh_out = NamedSharding(mesh, P(axis, None, None))
    # impl="xla": the fused Pallas phase kernel is opaque to the SPMD
    # partitioner (it would force an all-gather of the frame); the planar
    # polyphase EASU→RCAS chain is pad+slice stencils that partition
    # cleanly — XLA inserts the 2-ring halo exchanges over ICI from the
    # in/out sharding annotations alone.
    fn = _fsr.make_fsr_upscaler(in_h, in_w, out_h, out_w, quality, impl="xla")
    return jax.jit(fn, in_shardings=sh_in, out_shardings=sh_out)


def fsr_frame_spatial(
    frame,
    out_h: int,
    out_w: int,
    quality: str = "quality",
    mesh: Mesh | None = None,
    axis: str = "batch",
) -> jax.Array:
    """ONE frame's FSR (EASU+RCAS) with the frame sharded spatially (sp):
    input/output rows split over the mesh so a single frame's latency can
    use the whole slice — the FSR counterpart of `upscale_frame_spatial` /
    `interpolate_frame_spatial`. frame: u8 [H, W, 4]."""
    if mesh is None:
        mesh = make_mesh(axis=axis)
    in_h, in_w = int(frame.shape[0]), int(frame.shape[1])
    fn = _spatial_fsr_fn(mesh, in_h, in_w, int(out_h), int(out_w), quality, axis)
    sh = NamedSharding(mesh, P(axis, None, None))
    return fn(jax.device_put(jnp.asarray(frame, jnp.uint8), sh))


def _spatial_refine_builder(mode: str):
    """The sp refinement closure, or None. It rides the FLOAT-domain module
    forward, not the raw-domain selector-matmul graph: the one-hot row-phase
    selector einsum contracts over the full H axis, which under row sharding
    would force an all-gather; the module's s2d reshape is local per shard
    (H_shard must divide the stride) and XLA inserts the conv halo exchanges
    over ICI — same design as `esrgan_infer_spatial`."""
    if mode != "flow_soft_ref":
        return None
    from nu_scaler_tpu.models import interp_refine as _ir

    restored = _ir.load_checkpoint()
    if restored is None:
        raise ValueError("flow_soft_ref needs a trained interp_ref4 checkpoint")
    _params = restored[0]
    _model, _ = _ir.make_model()

    def refine(a, b, mid):
        triple = jnp.concatenate(
            [a[..., :3], b[..., :3], mid[..., :3]], axis=-1
        ).astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)
        res = _model.apply(_params, triple[None])[0]
        rgb = jnp.clip(
            jnp.round(mid[..., :3].astype(jnp.float32) + res.astype(jnp.float32) * 255.0),
            0,
            255,
        ).astype(jnp.uint8)
        return jnp.concatenate([rgb, mid[..., 3:]], axis=-1)

    return refine


@functools.lru_cache(maxsize=16)
def _spatial_interp_fn(mesh_key, mode: str, levels: int, axis: str):
    from nu_scaler_tpu.ops import interpolate as _interp

    mesh = mesh_key
    sh = NamedSharding(mesh, P(axis, None, None))
    refine = _spatial_refine_builder(mode)

    def fn(a, b, t):
        if mode == "blend":
            return _interp.blend_only(a, b, t)
        flow = _interp.compute_flow_fast(a, b, levels=levels)
        # pallas_ok=False: a pallas_call is opaque to the SPMD partitioner —
        # it would force a full gather and defeat the row sharding; the XLA
        # soft path partitions cleanly (halos from the sharding annotations)
        mid = _interp.warp_blend_fast(
            a, b, flow, t,
            overlap=mode in ("flow_soft", "flow_soft_ref"),
            pallas_ok=False,
        )
        if refine is not None:
            mid = refine(a, b, mid)
        return mid

    return jax.jit(fn, in_shardings=(sh, sh, None), out_shardings=sh)


def interpolate_frame_spatial(
    frame_a,
    frame_b,
    time_t: float = 0.5,
    mode: str = "flow",
    mesh: Mesh | None = None,
    levels: int = 2,
    axis: str = "batch",
) -> jax.Array:
    """ONE frame pair's MC interpolation with the frame sharded spatially
    (sp): input/output rows split over the mesh so a single frame's latency
    can use the whole slice. Like `esrgan_infer_spatial`, the sharding is
    expressed as jit in/out annotations and XLA's SPMD partitioner inserts
    the halo exchanges over ICI for the pyramid / Horn–Schunck stencils and
    the warp's candidate slabs — no manual ppermute.

    frame_a/frame_b: u8 [H, W, 4]. mode: "blend" | "flow" | "flow_soft" |
    "flow_soft_ref" (soft warp + the learned refinement net; needs a trained
    interp_ref4 checkpoint and H/mesh_size divisible by the net's stride).
    """
    if mesh is None:
        mesh = make_mesh(axis=axis)
    fn = _spatial_interp_fn(mesh, mode, levels, axis)
    sh = NamedSharding(mesh, P(axis, None, None))
    a = jax.device_put(jnp.asarray(frame_a, jnp.uint8), sh)
    b = jax.device_put(jnp.asarray(frame_b, jnp.uint8), sh)
    return fn(a, b, float(time_t))


@functools.lru_cache(maxsize=16)
def _spatial_multi_fn(mesh_key, ts: tuple, mode: str, levels: int, axis: str):
    from nu_scaler_tpu.ops import interpolate as _interp

    mesh = mesh_key
    sh = NamedSharding(mesh, P(axis, None, None))
    out_sh = NamedSharding(mesh, P(None, axis, None, None))
    refine = _spatial_refine_builder(mode)

    def fn(a, b):
        if mode == "blend":
            return jnp.stack([_interp.blend_only(a, b, t) for t in ts], axis=0)
        flow = _interp.compute_flow_fast(a, b, levels=levels)
        mids = [
            _interp.warp_blend_fast(
                a, b, flow, t,
                overlap=mode in ("flow_soft", "flow_soft_ref"),
                pallas_ok=False,
            )
            for t in ts
        ]
        if refine is not None:
            mids = [refine(a, b, m) for m in mids]
        return jnp.stack(mids, axis=0)

    return jax.jit(fn, in_shardings=(sh, sh), out_shardings=out_sh)


def interpolate_multi_spatial(
    frame_a,
    frame_b,
    ts=(1.0 / 3.0, 2.0 / 3.0),
    mode: str = "flow_soft",
    mesh: Mesh | None = None,
    levels: int = 2,
    axis: str = "batch",
) -> jax.Array:
    """ONE pair's N-factor frame generation with the frames sharded
    spatially (sp): one motion solve, one in-between frame per entry of
    `ts`, rows split over the mesh so a single pair's latency can use the
    whole slice — the multi-t counterpart of `interpolate_frame_spatial`
    (the FSR3 frame-gen role, fsr3.rs:319-376, latency-sharded).

    frame_a/frame_b: u8 [H, W, 4] → u8 [len(ts), H, W, 4]. Modes as in
    `interpolate_frame_spatial`; "flow_soft_ref" refines every mid with the
    learned net (float-domain module forward; H/mesh_size must divide the
    net's stride)."""
    if mesh is None:
        mesh = make_mesh(axis=axis)
    ts = tuple(float(t) for t in ts)
    fn = _spatial_multi_fn(mesh, ts, mode, levels, axis)
    sh = NamedSharding(mesh, P(axis, None, None))
    a = jax.device_put(jnp.asarray(frame_a, jnp.uint8), sh)
    b = jax.device_put(jnp.asarray(frame_b, jnp.uint8), sh)
    return fn(a, b)


def esrgan_infer_spatial(model, params, x, mesh: Mesh | None = None, axis: str = "batch",
                         quant_scales: dict | None = None):
    """Learned-tier inference with the FRAME sharded spatially (sp): input
    rows split over the mesh; XLA inserts the conv halo exchanges over ICI
    automatically from the sharding annotations (the jax.sharding/pjit way —
    no manual ppermute needed for 3×3 receptive fields).

    quant_scales routes the trunk through the production int8 grid
    (`esrgan_lite.make_quant_apply` — same integer weights/scales as the
    single-chip serving graph): conv inputs quantize per shard, so the
    halo rows XLA exchanges for the int8 convs move as int8 over ICI —
    half the bf16 halo traffic.

    x: [N, H, W, 3]; H must divide by mesh_size × model.stride."""
    if mesh is None:
        mesh = make_mesh(axis=axis)
    x_shard = NamedSharding(mesh, P(None, axis, None, None))
    if quant_scales is not None:
        from nu_scaler_tpu.models.esrgan_lite import make_quant_apply

        qfn = make_quant_apply(model, params, quant_scales)
        fn = jax.jit(
            lambda xx: qfn(xx), in_shardings=(x_shard,), out_shardings=x_shard
        )
        return fn(jax.device_put(x, x_shard))
    fn = jax.jit(
        lambda p, xx: model.apply(p, xx),
        in_shardings=(None, x_shard),
        out_shardings=x_shard,
    )
    return fn(params, jax.device_put(x, x_shard))


def esrgan_batch_sharded(
    frames: np.ndarray,
    out_h: int,
    out_w: int,
    mesh: Mesh | None = None,
    prefer: str = "quality",
) -> jax.Array:
    """Learned-tier batch upscale data-parallel over the mesh: u8 RGBA
    [N, H, W, 4] → [N, OH, OW, 4] with the batch axis sharded; every device
    runs the PRODUCTION fused serving graph (same weights / int8 grid as
    single-chip `esrgan_lite.make_pretrained_upscaler`) on its shard.
    Collective-free dp — the rayon-fan-out→mesh mapping of SURVEY §2.6
    applied to the learned tier (the classical tiers already have it in
    `upscale_batch_sharded`). Ragged batches pad by repeating the last
    frame, like `upscale_batch_sharded`.

    The win is the mesh fan-out (and dispatch grouping); on a SINGLE chip
    the batched program is timing-neutral-to-negative at 4K serving
    shapes — the graph already saturates the MXU (measured r4,
    tools/experiments/esrgan_batch_honest.py)."""
    from nu_scaler_tpu.models import esrgan_lite

    if mesh is None:
        mesh = make_mesh()
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    size = mesh.devices.size
    pad = (-n) % size
    if pad:
        frames = np.concatenate([frames, np.repeat(frames[-1:], pad, axis=0)])
    single = esrgan_lite.make_pretrained_upscaler(h, w, out_h, out_w, prefer=prefer)
    sh = NamedSharding(mesh, P("batch"))
    fn = jax.jit(jax.vmap(single), in_shardings=(sh,), out_shardings=sh)
    out = fn(jax.device_put(jnp.asarray(frames), sh))
    return out[:n] if pad else out
