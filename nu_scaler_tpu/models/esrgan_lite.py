"""ESRGAN-lite — the learned "quality" tier (flax).

Replaces the role of the reference's vendor-SDK stubs (`dlss-sys`,
`fsr3-sys`, `upscale/dlss.rs.disabled` — SURVEY §2 C11/C12): a lightweight
residual conv super-resolution network served through the "dlss" technology
string and `create_advanced_upscaler("ultra")`.

Architecture: shallow RRDB-style trunk — features conv → N residual blocks
(conv-relu-conv, 0.2-scaled skip) → global skip → pixel-shuffle ×2 upsample
stages → RGB head, bilinear base added back (the net learns the residual
detail). All convs are NHWC 3×3 — XLA maps them onto the MXU as implicit
GEMMs; channel counts are multiples of 8 to tile cleanly.

Sharding (used by `dryrun_multichip` and multi-chip training):
  * dp: batch over the `data` mesh axis
  * tp: conv channels over the `model` axis (kernel HWIO → O sharded; the
    channel dim is contracted locally per shard then laid out so no
    collective is needed between blocks except the XLA-inserted ones)
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(h)
        return x + 0.2 * h


def _shift_zero(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """out[n, i, j, c] = x[n, i+dy, j+dx, c], zero beyond the edge (matches
    nn.Conv SAME zero padding). Pad+slice — no gathers."""
    if dy == 0 and dx == 0:
        return x
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)), (0, 0)))
    y0 = max(0, -dy) + dy
    x0 = max(0, -dx) + dx
    return xp[:, y0 : y0 + h, x0 : x0 + w, :]


class ShiftConv(nn.Module):
    """3×3 SAME conv expressed as 9 shifted [C_in → C_out] matmuls.

    Identical parameters to `nn.Conv(features, (3, 3), padding="SAME")`
    (kernel HWIO + bias), so checkpoints transfer — but each tap is a clean
    MXU dot_general instead of XLA's convolution lowering, which on this
    backend runs the 64-channel trunk ~5× slower than the equivalent
    matmuls (19 ms vs ~4 ms per 1080p frame measured end-to-end)."""

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        kernel = kernel.astype(x.dtype)
        out = None
        for dy in range(3):
            for dx in range(3):
                term = jnp.einsum(
                    "nhwc,co->nhwo", _shift_zero(x, dy - 1, dx - 1), kernel[dy, dx]
                )
                out = term if out is None else out + term
        return out + bias.astype(out.dtype)


class ResBlockS(nn.Module):
    """ResBlock on ShiftConv (child names match ResBlock → checkpoints
    transfer)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = ShiftConv(self.features, name="conv1")(x)
        h = nn.relu(h)
        h = ShiftConv(self.features, name="conv2")(h)
        return x + 0.2 * h


class PallasConv(nn.Module):
    """3×3 SAME conv through the Pallas row-strip kernel (bias + optional
    ReLU fused; 49.9% of MXU peak vs XLA's 29% at the trunk shape —
    kernels/conv_pallas.py). Parameter-compatible with nn.Conv. Forward-only
    (no custom VJP) — used for SERVING; training keeps nn.Conv."""

    features: int
    relu: bool = False

    @nn.compact
    def __call__(self, x):  # [N, H, W, C]
        from nu_scaler_tpu.kernels.conv_pallas import make_conv3x3

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        fn = make_conv3x3(x.shape[1], x.shape[2], cin, self.features, self.relu)
        if fn is None:  # channels not lane-aligned: XLA fallback
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(x.dtype)
            return jnp.maximum(y, 0) if self.relu else y
        outs = [fn(x[i], kernel, bias) for i in range(x.shape[0])]
        return jnp.stack(outs).astype(x.dtype)


class ResBlockP(nn.Module):
    """ResBlock on PallasConv (child names match → checkpoints transfer)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = PallasConv(self.features, relu=True, name="conv1")(x)
        h = PallasConv(self.features, relu=False, name="conv2")(h)
        return x + 0.2 * h


class ESRGANLite(nn.Module):
    """2x-per-stage super-resolution; `stages` pixel-shuffle doublings."""

    features: int = 32
    blocks: int = 4
    stages: int = 1  # 1 → 2x, 2 → 4x

    @nn.compact
    def __call__(self, x):  # x: [N, H, W, 3] float32 in [0,1]
        feat = nn.Conv(self.features, (3, 3), padding="SAME", name="head")(x)
        h = feat
        for i in range(self.blocks):
            h = ResBlock(self.features, name=f"block{i}")(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="trunk")(h) + feat
        for s in range(self.stages):
            h = nn.Conv(self.features * 4, (3, 3), padding="SAME", name=f"up{s}")(h)
            # pixel shuffle 2x: [N,H,W,4F] -> [N,2H,2W,F]
            n, hh, ww, c = h.shape
            h = h.reshape(n, hh, ww, 2, 2, c // 4)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh * 2, ww * 2, c // 4)
            h = nn.relu(h)
        out = nn.Conv(3, (3, 3), padding="SAME", name="tail")(h)
        base = jax.image.resize(x, out.shape, method="bilinear")
        return base + out


@functools.lru_cache(maxsize=8)
def _bilinear_base_kernel(c: int, upscale: int, stride: int = 2) -> np.ndarray:
    """Fixed HWIO 3×3 kernel turning the s2d(`stride`) tensor into the
    PHASE-DOMAIN bilinear upscale of the original image (half-pixel-center
    alignment).

    Output pixel (r·I+p) at scale `upscale` (r = stride·upscale phases on
    the 1/stride-res trunk grid) samples input coordinate
    stride·I + (p+0.5)/upscale − 0.5, whose two bilinear taps always live in
    the 3×3 s2d neighborhood. Lets the residual's base be one cheap conv at
    trunk resolution instead of a channel-minor f32 `jax.image.resize` at 4K
    (measured 3.7 ms/frame)."""
    s = stride
    r = s * upscale
    k = np.zeros((3, 3, s * s * c, r * r * c), np.float32)
    for py in range(r):
        dy = (py + 0.5) / upscale - 0.5
        m0 = int(np.floor(dy))
        fy = dy - m0
        for px in range(r):
            dx = (px + 0.5) / upscale - 0.5
            n0 = int(np.floor(dx))
            fx = dx - n0
            for m, wy in ((m0, 1.0 - fy), (m0 + 1, fy)):
                for nn_, wx in ((n0, 1.0 - fx), (n0 + 1, fx)):
                    diy, qy = m // s, m % s
                    dix, qx = nn_ // s, nn_ % s
                    for ch in range(c):
                        k[
                            diy + 1,
                            dix + 1,
                            qy * s * c + qx * c + ch,
                            py * r * c + px * c + ch,
                        ] += wy * wx
    return k


@functools.lru_cache(maxsize=8)
def _sparse_base_terms(c: int, upscale: int, stride: int):
    """Factor the fixed base kernel K[3, 3, I, O] into the dense center-cell
    1×1 matrix plus, per neighbor cell offset, a (A [I, k], B [k, O]) pair
    where k = that offset's nonzero output phases (edge/corner phases only —
    e.g. 48 of 768 at stride 8). B is a one-tap channel scatter."""
    K = _bilinear_base_kernel(c, upscale, stride)
    center = K[1, 1]
    terms = []
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            if oy == 0 and ox == 0:
                continue
            M = K[oy + 1, ox + 1]
            nz = np.nonzero(np.any(M != 0.0, axis=0))[0]
            if nz.size == 0:
                continue
            A = np.ascontiguousarray(M[:, nz])
            B = np.zeros((nz.size, M.shape[1]), np.float32)
            B[np.arange(nz.size), nz] = 1.0
            terms.append((oy, ox, A, B))
    return center, tuple(terms)


def _shift_edge_nhwc(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """out[n, i, j, c] = x[n, clip(i+dy), clip(j+dx), c] (edge clamp — the
    semantics of the dense base path's edge-padded VALID conv)."""
    if dy == 0 and dx == 0:
        return x
    n, h, w, c = x.shape
    xp = jnp.pad(
        x,
        ((0, 0), (max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)), (0, 0)),
        mode="edge",
    )
    y0 = max(0, -dy) + dy
    x0 = max(0, -dx) + dx
    return xp[:, y0 : y0 + h, x0 : x0 + w, :]


class ESRGANLiteTPU(nn.Module):
    """TPU-layout variant: space-to-depth(2) front end so the trunk runs at
    half spatial resolution with a lane-friendly channel count, and the tail
    emits all output phases at once (depth-to-space 2*upscale).

    Rationale: the base net's 32-feature NHWC convs at full 1080p measured
    ~86 ms/frame — C=32 underfills the 128-lane dim and every layer drags
    full-resolution activations through HBM. Halving spatial dims and
    doubling channels keeps the same information with ~4× less traffic.

    Round-2 rework: the network lives entirely in the PHASE DOMAIN — the
    bilinear base is a fixed conv over the s2d tensor added to the tail
    (`_bilinear_base_kernel`), so serving can quantize to u8 at trunk
    resolution and do the depth-to-space relayout in u8 (the old path's
    channel-minor f32 resize + 4K f32 d2s cost ~7 of its 19 ms).
    """

    features: int = 64
    blocks: int = 3
    upscale: int = 2  # overall spatial scale factor
    conv_impl: str = "conv"  # "conv" = XLA convolution | "shift" = 9 matmuls
    stride: int = 2  # space-to-depth factor: trunk runs at 1/stride res.
    # Measured conv efficiency on v5e (same FLOPs): 540p/C=64 = 5.2% of
    # peak, 270p/C=128 = 28.9%, 135p/C=256 = 56.1% — deeper s2d with wider
    # channels is the lever (tools/experiments/conv_sweep.py).
    base_impl: str = "conv"  # "conv" = dense fixed 3×3 | "sparse" = structured
    # The fixed base kernel is 99.8% zeros (each output phase has ≤4 bilinear
    # taps): "sparse" computes the SAME values as a center-cell 1×1 matmul
    # plus 8 tiny two-step neighbor corrections (reduced columns → one-tap
    # channel scatter), cutting e.g. 86 GFLOP → ~18 at stride 8 / C=192.
    # Parameter-free either way — checkpoints are interchangeable.

    def _conv(self, feats: int, name: str):
        if self.conv_impl == "shift":
            return ShiftConv(feats, name=name)
        if self.conv_impl == "pallas":
            # lane-aligned layers ride the Pallas kernel; PallasConv itself
            # falls back to XLA for non-128-multiple channels (head/tail)
            return PallasConv(feats, name=name)
        return nn.Conv(feats, (3, 3), padding="SAME", name=name)

    def _res_block(self, feats: int, name: str):
        if self.conv_impl == "shift":
            return ResBlockS(feats, name=name)
        if self.conv_impl == "pallas":
            return ResBlockP(feats, name=name)
        return ResBlock(feats, name=name)

    @nn.compact
    def __call__(self, x, phase_domain: bool = False):
        """x: [N, H, W, 3] f32/bf16 in [0,1] → full image [N, uH, uW, 3], or
        the phase tensor [N, H/2, W/2, r²·3] when phase_domain=True."""
        n, h, w, c = x.shape
        st = self.stride
        s2d = x.reshape(n, h // st, st, w // st, st, c)
        s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // st, w // st, st * st * c)
        feat = self._conv(self.features, "head")(s2d)
        hdn = feat
        for i in range(self.blocks):
            hdn = self._res_block(self.features, f"block{i}")(hdn)
        hdn = self._conv(self.features, "trunk")(hdn) + feat
        r = st * self.upscale  # phases relative to the trunk grid
        tail = self._conv(r * r * 3, "tail")(hdn)
        # FIXED bilinear base over the s2d neighborhood, edge-replicated
        # (zero-pad would leave a dark bilinear ring at image borders; the
        # learned convs keep zero-pad SAME, which training absorbs)
        if self.base_impl == "sparse":
            center, terms = _sparse_base_terms(c, self.upscale, st)
            base = jnp.einsum("nhwi,io->nhwo", s2d, jnp.asarray(center, x.dtype))
            for oy, ox, a_m, b_m in terms:
                sh = _shift_edge_nhwc(s2d, oy, ox)
                red = jnp.einsum("nhwi,ik->nhwk", sh, jnp.asarray(a_m, x.dtype))
                base = base + jnp.einsum(
                    "nhwk,ko->nhwo", red, jnp.asarray(b_m, x.dtype)
                )
        else:
            base_k = jnp.asarray(_bilinear_base_kernel(c, self.upscale, st), x.dtype)
            s2d_pad = jnp.pad(s2d, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            base = jax.lax.conv_general_dilated(
                s2d_pad, base_k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        phases = tail + base
        if phase_domain:
            return phases
        nh, nw = h // st, w // st
        out = phases.reshape(n, nh, nw, r, r, 3)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(n, nh * r, nw * r, 3)


def scale_to_stages(in_h: int, out_h: int) -> int:
    ratio = out_h / in_h
    stages = max(1, int(round(np.log2(max(ratio, 2.0)))))
    return stages


def init_params(rng_seed: int = 0, stages: int = 1, features: int = 32, blocks: int = 4):
    model = ESRGANLite(features=features, blocks=blocks, stages=stages)
    params = model.init(jax.random.PRNGKey(rng_seed), jnp.zeros((1, 32, 32, 3), jnp.float32))
    return model, params


# ---------------------------------------------------------------------------
# Training (the checkpoint/resume + learned-tier stretch, SURVEY §7 step 8)
# ---------------------------------------------------------------------------


def l1_loss(model: ESRGANLite, params, lr_batch, hr_batch):
    pred = model.apply(params, lr_batch)
    return jnp.mean(jnp.abs(pred - hr_batch))


def l1_grad_loss(model, params, lr_batch, hr_batch, w: float = 0.5):
    """L1 + gradient-difference term — pushes local structure (SSIM) without
    a perceptual net."""
    pred = model.apply(params, lr_batch)
    l1 = jnp.mean(jnp.abs(pred - hr_batch))
    gy = jnp.mean(
        jnp.abs(
            (pred[:, 1:] - pred[:, :-1]) - (hr_batch[:, 1:] - hr_batch[:, :-1])
        )
    )
    gx = jnp.mean(
        jnp.abs(
            (pred[:, :, 1:] - pred[:, :, :-1])
            - (hr_batch[:, :, 1:] - hr_batch[:, :, :-1])
        )
    )
    return l1 + w * (gy + gx)


def make_train_step(model: ESRGANLite, optimizer, loss: str = "l1"):
    loss_fn = l1_grad_loss if loss == "l1_grad" else l1_loss

    @jax.jit
    def train_step(params, opt_state, lr_batch, hr_batch):
        lv, grads = jax.value_and_grad(lambda p: loss_fn(model, p, lr_batch, hr_batch))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, lv

    return train_step


def param_shardings(params, mesh: Mesh):
    """tp layout: conv kernels HWIO shard O over 'model'; biases shard over
    'model'; everything falls back to replicated when not divisible."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape))["model"]

    def spec_for(path, leaf):
        if leaf.ndim == 4 and leaf.shape[-1] % model_size == 0:
            return P(None, None, None, "model")
        if leaf.ndim == 1 and leaf.shape[0] % model_size == 0:
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params
    )


def make_sharded_train_step(model: ESRGANLite, optimizer, mesh: Mesh, params):
    """dp×tp train step: batch over 'data', channels over 'model'.

    Returns (step_fn, sharded_params, opt_state). Optimizer-state shardings
    (per-param moments) are inferred by jit from the sharded params it was
    initialized with.
    """
    p_shard = param_shardings(params, mesh)
    sharded_params = jax.device_put(params, p_shard)
    opt_state = optimizer.init(sharded_params)
    batch_shard = NamedSharding(mesh, P("data"))
    step = jax.jit(
        lambda params, opt_state, lr, hr: _sharded_step_body(
            model, optimizer, params, opt_state, lr, hr
        ),
        in_shardings=(p_shard, None, batch_shard, batch_shard),
        out_shardings=(p_shard, None, None),
    )
    return step, sharded_params, opt_state


def _sharded_step_body(model, optimizer, params, opt_state, lr_batch, hr_batch):
    loss, grads = jax.value_and_grad(lambda p: l1_loss(model, p, lr_batch, hr_batch))(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


# ---------------------------------------------------------------------------
# Inference (the "dlss" tech tier)
# ---------------------------------------------------------------------------

_PRETRAINED: dict[int, Any] = {}


def get_params(stages: int):
    """Serving weights per stage count: the latest orbax checkpoint when one
    exists (`nu_scaler_tpu/models/train.py`), else seed-0 init (the net then
    acts as a mildly perturbed bilinear thanks to the global skip)."""
    if stages not in _PRETRAINED:
        try:
            from nu_scaler_tpu.models.train import load_checkpoint

            restored = load_checkpoint(stages)
        except Exception:  # noqa: BLE001 — orbax missing / corrupt ckpt
            restored = None
        if restored is not None:
            _PRETRAINED[stages] = restored[0]
        else:
            _, params = init_params(0, stages)
            _PRETRAINED[stages] = params
    return _PRETRAINED[stages]


def set_params(stages: int, params) -> None:
    _PRETRAINED[stages] = params


@functools.lru_cache(maxsize=32)
def make_pretrained_upscaler(
    in_h: int, in_w: int, out_h: int, out_w: int, dtype=jnp.bfloat16,
    prefer: str = "quality",
):
    """u8 RGBA [H,W,4] → u8 RGBA [OH,OW,4]; net on RGB, alpha resampled
    bilinearly; net output resized to the exact target when the stage ratio
    doesn't land on it.

    Inference runs in bf16 by default (weights + activations): halves HBM
    traffic, and the global bilinear skip keeps the residual small so the
    reduced mantissa costs <0.5 dB.

    prefer: "quality" (default — tpu4b2, ≥240 fps at +4.8 dB) | "ultra"
    (tpu4, the held-out quality peak at ~150 fps).
    """
    stages = scale_to_stages(in_h, out_h)
    if prefer not in _ARCH_LADDER:
        prefer = "quality"
    return _build_pretrained(in_h, in_w, out_h, out_w, dtype, stages, prefer)


@functools.lru_cache(maxsize=8)
def make_pretrained_batch_upscaler(
    in_h: int, in_w: int, out_h: int, out_w: int, dtype=jnp.bfloat16,
    prefer: str = "quality",
):
    """Batched learned serving: ONE compiled program over u8 RGBA
    [N, H, W, 4] (vmap of the fused single-frame graph), u8 [N, OH, OW, 4]
    out — the grouped-dispatch form `upscale_batch` / `transcode --batch`
    ride, and the body `mesh.esrgan_batch_sharded` shards dp over a mesh
    (N chips ≈ N× throughput — the rayon-fan-out→mesh mapping of SURVEY
    §2.6, upscale/mod.rs:609-640).

    SINGLE-chip batch>1 is a measured NEGATIVE at 1080p→4K serving shapes
    (r4, tools/experiments/esrgan_batch_honest.py): batch=2 runs 3.805 vs
    3.226 ms/frame on tpu4b2-int8+io — the serving graph already saturates
    the MXU, and the batched relayouts cost more than the dispatch
    overhead they amortize. (esrgan_surgery7.py arm D's +42% was an
    artifact: it stacked the SAME frame inside the jitted graph, which XLA
    elided as a broadcast.) Use this for mesh fan-out and API batch
    grouping, not as a single-chip speed knob — live serving keeps the
    single-frame program either way.

    Batch-size polymorphic: each distinct N compiles once (transcode pads
    its final short group to the steady batch to avoid a second program).
    """
    single = make_pretrained_upscaler(in_h, in_w, out_h, out_w, dtype, prefer)
    batched = jax.jit(jax.vmap(single))

    def fn(imgs):
        return batched(imgs)

    fn.arch = single.arch
    fn.quantized = single.quantized
    return fn


@functools.lru_cache(maxsize=32)
def make_fast_upscaler(
    in_h: int, in_w: int, out_h: int, out_w: int, dtype=jnp.bfloat16
):
    """The "performance" learned tier: prefers the stride-8 trunks (tpu8w =
    C192 no-bottleneck, then tpu8 = C128 fastest) before the quality-first
    order. Serves `create_advanced_upscaler`'s learned path when the caller
    asked for a performance/balanced quality (facade tech "dlss")."""
    stages = scale_to_stages(in_h, out_h)
    return _build_pretrained(in_h, in_w, out_h, out_w, dtype, stages, "performance")


# arch preference ladders. Quality-first: tpu4 (+4.48 dB vs lanczos3
# held-out) leads — the stride-8 archs trade quality for speed (tpu8/C128
# measured 249 fps but only lanczos3-level quality: the 128-wide trunk
# bottlenecks the 192-dim s2d input). Performance-first tries the stride-8
# trunks before falling back to the quality order.
# Ladder entries are (arch, model kwargs, mode): mode "quant" means the
# entry only serves when an int8 calibration file matches the checkpoint
# (load_act_scales) — used to put the int8 forms at the head of the
# quality ladder (r4: tpu4b2-int8+io at 312 fps ≥ the 240 gate) while the
# bf16 forms stay lower-priority fallbacks.
_ARCH_LADDER = {
    # the held-out quality PEAK, served by NuScaler("dlss", "ultra") in
    # bf16 (never quantized). r4: the distill+down_mix tpu4b2 BEATS the
    # 3-block tpu4 on full eval (+6.21 vs +5.84 dB; SSIM −0.004 near-tie)
    # while being faster — the 2-block student leads; plain "dlss"
    # requests keep the ≥240 fps quality ladder below
    "ultra": (
        ("tpu4b2", dict(stride=4, features=128, blocks=2), None),
        ("tpu4", dict(stride=4, features=128), None),
        ("tpu", {}, None),
    ),
    "quality": (
        # tpu4b2-int8 (r4): the distill+down_mix fine-tune (teacher tpu4,
        # half the clip pool rendered at 2× and area-downsampled) lifted
        # the 2-block net PAST its 3-block teacher — held-out int8 twin
        # +5.67 dB / +0.090 SSIM 3-seed (+5.44/+0.094 2-seed; bf16 +6.21)
        # at 283 fps honest-chained (3.531 ms, surgery8) — dominating the
        # r3 head tpu4-int8 (260.3 fps at +5.04 2-seed) on BOTH axes.
        ("tpu4b2", dict(stride=4, features=128, blocks=2), "quant"),
        # tpu4-int8 (r3 head): the full 3-block net, 260.3 fps at +5.04
        # (2-seed, served grid) — fallback when tpu4b2 calibration is absent.
        ("tpu4", dict(stride=4, features=128), "quant"),
        ("tpu4b2", dict(stride=4, features=128, blocks=2), None),
        ("tpu4", dict(stride=4, features=128), None),
        ("tpu", {}, None),
    ),
    "performance": (
        # tpu4b1 (r3, warm-started from tpu4b2) DOMINATES the stride-8
        # trunks on both axes — vs tpu8w's +1.98 dB at 202 fps. r4: io-int8
        # (128-lane head/base) serves **352.3 fps at +2.31 dB / +0.048
        # SSIM** 3-seed (trunk-only int8 was 300-307 at +2.36 — io costs
        # 0.05 dB for +52 fps). The stride-4 phase reconstruction keeps
        # the spatial detail the 16×16-phase stride-8 tail loses, and one
        # residual block is enough to beat C=192 at 135p.
        ("tpu4b1", dict(stride=4, features=128, blocks=1), None),
        ("tpu8w", dict(stride=8, features=192), None),
        ("tpu8", dict(stride=8, features=128), None),
        ("tpu4b2", dict(stride=4, features=128, blocks=2), None),
        ("tpu4", dict(stride=4, features=128), None),
        ("tpu", {}, None),
    ),
}


def _build_pretrained(in_h, in_w, out_h, out_w, dtype, stages, prefer):
    model = None
    arch_name = "lite"
    quant = None
    try:
        from nu_scaler_tpu.models.train import load_act_scales, load_checkpoint

        # serving uses XLA convs: the Pallas conv kernel is 2x faster
        # standalone (0.196 vs 0.393 ms/conv, kernels/conv_pallas.py) but the
        # COMPOSED pipeline measured slower (7.51 vs 6.58 ms/frame) — per-
        # layer pallas_calls break XLA's skip-add/boundary fusion. Kept as
        # conv_impl="pallas" for whole-trunk fusion work later.
        impl = "conv"
        for arch, kw, mode in _ARCH_LADDER[prefer]:
            st_req = kw.get("stride", 2)
            if in_h % st_req or in_w % st_req:
                continue  # s2d front end needs stride-divisible dims
            restored = load_checkpoint(stages, arch)
            if restored is not None:
                if mode == "quant" and load_act_scales(
                    stages, arch, restored[1]
                ) is None:
                    continue  # int8-gated entry without calibration
                # stride-8 serving uses the structured sparse base
                # (numerically equivalent to the dense fixed conv, ≤1e-5 —
                # checkpoint-interchangeable; _sparse_base_terms);
                # at stride ≤4 the dense conv measured FASTER (the sparse
                # path's tiny-dim scatter einsums cost more than the dense
                # kernel's wasted zeros — tools/esrgan_arch_sweep.py)
                base = "sparse" if st_req == 8 else "conv"
                model = ESRGANLiteTPU(
                    upscale=2**stages, conv_impl=impl, base_impl=base, **kw
                )
                params = restored[0]
                arch_name = arch
                # "quality"/"performance" serve the int8 trunk when a
                # calibration file matches the checkpoint step (277 vs 240
                # fps on tpu4b2, held-out +4.48 dB ≥ the +4 gate —
                # int8_serving_probe.py). "ultra" keeps the bf16 MXU path:
                # it is the fidelity-peak tier and its extra ~0.4 dB is the
                # whole point of asking for it.
                if prefer != "ultra":
                    quant = load_act_scales(stages, arch, restored[1])
                break
    except Exception:  # noqa: BLE001
        pass
    if model is None:
        model = ESRGANLite(stages=stages)
        params = get_params(stages)
    served = make_serving_fn(
        model, params, in_h, in_w, out_h, out_w, dtype, quant_scales=quant
    )

    def fn(img):
        return served(img)

    fn.arch = arch_name  # introspection for tests / the benchmark report
    fn.quantized = quant is not None
    return fn


def _expand_in_rgba(k: np.ndarray, st: int, scale: float) -> np.ndarray:
    """HWIO kernel with I = st²·3 (RGB s2d rows) → I' = st²·4 (RGBA s2d),
    alpha rows zero, weights scaled by `scale` (absorbs the 1/255 input
    normalization so the graph can run on raw 0..255 values, which are
    bf16-exact)."""
    kh, kw, _i3, o = k.shape
    out = np.zeros((kh, kw, st * st * 4, o), np.float32)
    for q in range(st * st):
        out[:, :, q * 4 : q * 4 + 3, :] = k[:, :, q * 3 : q * 3 + 3, :] * scale
    return out


def _expand_out_rgba(k: np.ndarray, b: np.ndarray, r: int, scale: float):
    """HWIO kernel with O = r²·3 phase-major RGB → O' = r²·4 RGBA-interleaved
    (alpha outputs zero), scaled by `scale` (255 → raw-domain phases)."""
    kh, kw, i, _o3 = k.shape
    out = np.zeros((kh, kw, i, r * r * 4), np.float32)
    ob = np.zeros((r * r * 4,), np.float32)
    for ph in range(r * r):
        out[:, :, :, ph * 4 : ph * 4 + 3] = k[:, :, :, ph * 3 : ph * 3 + 3] * scale
        ob[ph * 4 : ph * 4 + 3] = b[ph * 3 : ph * 3 + 3] * scale
    return out, ob


@functools.lru_cache(maxsize=8)
def _row_phase_selectors(in_h: int, st: int):
    """One-hot [in_h/st, in_h] row selectors per vertical phase — the s2d
    relayout as st MXU matmuls. The strided-slice/transpose forms of s2d
    measured 2.3 ms/frame at 1080p on v5e (strided slicing is a gather-class
    relayout, CLAUDE.md); these one-hot matmuls + a free lane concat measured
    0.05 ms (tools/experiments/esrgan_surgery3.py)."""
    nh = in_h // st
    sels = []
    for q in range(st):
        s = np.zeros((nh, in_h), np.float32)
        s[np.arange(nh), np.arange(nh) * st + q] = 1.0
        sels.append(jnp.asarray(s, jnp.bfloat16))
    return tuple(sels)


def _quant_kernel_i8(k: np.ndarray):
    """HWIO f32 kernel → (int8 kernel, per-output-channel dequant scale).

    Symmetric per-O quantization: kq[..., o] = round(k[..., o] / s_o) with
    s_o = max|k[..., o]| / 127 (all-zero channels — e.g. the RGBA-expanded
    tail's alpha outputs — get s=1, kq=0)."""
    amax = np.max(np.abs(k), axis=(0, 1, 2))
    s = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    kq = np.clip(np.round(k / s), -127, 127).astype(np.int8)
    return kq, s


def _quant_kernel_i8_dc(k: np.ndarray):
    """Like `_quant_kernel_i8` but DC-exact: the per-channel dequant scale is
    renormalized so the quantized taps sum to the original tap sum. For the
    parameter-free bilinear base (non-negative taps summing to 1 per output
    phase) this makes flat fields — including the α≡255 plane that rides the
    base — reproduce EXACTLY through the int8 path."""
    kq, s = _quant_kernel_i8(k)
    qsum = kq.astype(np.float64).sum(axis=(0, 1, 2))
    osum = k.astype(np.float64).sum(axis=(0, 1, 2))
    s = np.where(qsum != 0, osum / np.where(qsum == 0, 1, qsum), s).astype(
        np.float32
    )
    return kq, s


def _conv_i8(x, kq, dq, b, ax, pad="SAME"):
    """int8 MXU conv with float-domain interface: quantize x by the
    calibrated activation scale `ax`, convolve int8×int8→int32 (the v5e MXU
    int8 path — measured 1.53× bf16 conv throughput at the trunk shape,
    tools/experiments/int8_conv_probe.py), dequantize per output channel.

    Quantization is symmetric (zero → 0), so SAME zero padding keeps its
    semantics through the int8 path. The quantize / dequantize chains are
    elementwise and fuse around the conv; intermediates stay in registers
    (f32 math costs nothing extra inside the fusion, and keeps round() on
    an exact grid)."""
    inv = jnp.float32(127.0 / ax)
    xq = (
        jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127)
        .astype(jnp.int8)
    )
    y = jax.lax.conv_general_dilated(
        xq, kq, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (dq * jnp.float32(ax / 127.0))
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def calibrate_trunk_scales(model, params, lr_batch) -> dict:
    """Per-conv-input activation maxima for the int8 trunk, measured in the
    float domain (identical to the fused serving graph's trunk domain — the
    head kernel absorbs 1/255 there, so trunk activations match).

    lr_batch: f32 RGB [N, h, w, 3] in [0,1] — use TRAINING-clip crops
    (seeds 100+); the held-out eval seeds (900+) must not leak into
    calibration. Returns {"block{i}/conv1": amax, ..., "trunk": amax,
    "tail": amax}."""
    p = params["params"] if "params" in params else params

    def conv_f(x, leaf):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(np.asarray(leaf["kernel"], np.float32)),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(np.asarray(leaf["bias"], np.float32))

    st = model.stride
    x = jnp.asarray(lr_batch, jnp.float32)
    n, h, w, c = x.shape
    s2d = x.reshape(n, h // st, st, w // st, st, c)
    s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // st, w // st, st * st * c)
    feat = conv_f(s2d, p["head"])
    scales: dict = {}
    hdn = feat
    i = 0
    while f"block{i}" in p:
        scales[f"block{i}/conv1"] = float(jnp.max(jnp.abs(hdn)))
        t1 = jax.nn.relu(conv_f(hdn, p[f"block{i}"]["conv1"]))
        scales[f"block{i}/conv2"] = float(jnp.max(jnp.abs(t1)))
        hdn = hdn + 0.2 * conv_f(t1, p[f"block{i}"]["conv2"])
        i += 1
    scales["trunk"] = float(jnp.max(jnp.abs(hdn)))
    hdn = conv_f(hdn, p["trunk"]) + feat
    scales["tail"] = float(jnp.max(jnp.abs(hdn)))
    return scales


def default_trunk_scales(model, params, n_clips: int = 4) -> dict:
    """Calibrate on training-clip crops through the production video path
    (seeds 100.., disjoint from the 900+ eval seeds)."""
    from nu_scaler_tpu.models.data import clip_through_video_path, render_clip

    crops = []
    rng = np.random.default_rng(7)
    sc = model.upscale  # LR = HR / upscale, matching the serving input domain
    # clips are 288×512: cap the crop so HR fits, LR stays stride-divisible
    lr_c = min(96, 288 // sc // model.stride * model.stride)
    hr_c = lr_c * sc
    for seed in range(100, 100 + n_clips):
        frames = clip_through_video_path(render_clip(seed=seed, frames=2))
        for f in frames:
            y = rng.integers(0, f.shape[0] - hr_c + 1)
            x = rng.integers(0, f.shape[1] - hr_c + 1)
            hr = f[y : y + hr_c, x : x + hr_c, :3].astype(np.float32) / 255.0
            v = hr.reshape(lr_c, sc, lr_c, sc, 3).mean(axis=(1, 3))
            crops.append(v)
    return calibrate_trunk_scales(model, params, np.stack(crops))


def make_quant_apply(model, params, scales: dict):
    """Float-domain forward with the int8 trunk — the eval twin of the
    quantized serving graph (same integer weight grid, same activation
    scales), for `eval_vs_lanczos3` quality gating.

    f32 RGB [N, h, w, 3] in [0,1] → [N, uh, uw, 3]."""
    p = params["params"] if "params" in params else params
    st, up = model.stride, model.upscale
    head_k = jnp.asarray(np.asarray(p["head"]["kernel"], np.float32))
    head_b = jnp.asarray(np.asarray(p["head"]["bias"], np.float32))
    qblocks = []
    i = 0
    while f"block{i}" in p:
        blk = p[f"block{i}"]
        qblocks.append(
            tuple(
                (_quant_kernel_i8(np.asarray(blk[c]["kernel"], np.float32))
                 + (jnp.asarray(np.asarray(blk[c]["bias"], np.float32)),
                    scales[f"block{i}/{c}"]))
                for c in ("conv1", "conv2")
            )
        )
        i += 1
    trunk_kq, trunk_dq = _quant_kernel_i8(np.asarray(p["trunk"]["kernel"], np.float32))
    trunk_b = jnp.asarray(np.asarray(p["trunk"]["bias"], np.float32))
    tail_kq, tail_dq = _quant_kernel_i8(np.asarray(p["tail"]["kernel"], np.float32))
    tail_b = jnp.asarray(np.asarray(p["tail"]["bias"], np.float32))
    qblocks = [
        tuple((jnp.asarray(kq), jnp.asarray(dq), b, ax) for kq, dq, b, ax in blk)
        for blk in qblocks
    ]
    trunk_kq, trunk_dq = jnp.asarray(trunk_kq), jnp.asarray(trunk_dq)
    tail_kq, tail_dq = jnp.asarray(tail_kq), jnp.asarray(tail_dq)
    if "head" in scales:
        hkq, hdq = _quant_kernel_i8(np.asarray(p["head"]["kernel"], np.float32))
        hkq, hdq = jnp.asarray(hkq), jnp.asarray(hdq)
    if "base" in scales:
        # RGB (c=3) base kernel — eval inputs are RGB; the serving graph's
        # RGBA-expanded base shares the same per-RGB-output-channel grid
        bkq, bdq = _quant_kernel_i8_dc(
            _bilinear_base_kernel(3, up, st).astype(np.float32)
        )
        bkq, bdq = jnp.asarray(bkq), jnp.asarray(bdq)

    @jax.jit
    def fn(x):
        n, h, w, c = x.shape
        r = st * up
        s2d = x.reshape(n, h // st, st, w // st, st, c)
        s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, h // st, w // st, st * st * c
        )
        if "head" in scales:
            feat = _conv_i8(s2d, hkq, hdq, head_b, scales["head"])
        else:
            feat = (
                jax.lax.conv_general_dilated(
                    s2d, head_k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                + head_b
            )
        hdn = feat
        for (kq1, dq1, b1, ax1), (kq2, dq2, b2, ax2) in qblocks:
            t1 = jax.nn.relu(_conv_i8(hdn, kq1, dq1, b1, ax1))
            hdn = hdn + 0.2 * _conv_i8(t1, kq2, dq2, b2, ax2)
        hdn = _conv_i8(hdn, trunk_kq, trunk_dq, trunk_b, scales["trunk"]) + feat
        tail = _conv_i8(hdn, tail_kq, tail_dq, tail_b, scales["tail"])
        s2d_pad = jnp.pad(s2d, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        if "base" in scales:
            base = _conv_i8(s2d_pad, bkq, bdq, None, scales["base"], pad="VALID")
        else:
            base_k = jnp.asarray(_bilinear_base_kernel(c, up, st), x.dtype)
            base = jax.lax.conv_general_dilated(
                s2d_pad, base_k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        phases = tail + base
        nh, nw = h // st, w // st
        out = phases.reshape(n, nh, nw, r, r, 3)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(n, nh * r, nw * r, 3)

    return fn


def make_serving_fn_fused(model, params, in_h, in_w, dtype=jnp.bfloat16,
                          quant_scales: dict | None = None):
    """The production serving graph for exact-ratio ESRGANLiteTPU upscaling —
    the round-3 serving-graph surgery (VERDICT r2 next #1). u8 RGBA [H,W,4]
    → u8 RGBA [uH,uW,4], same trunk math as `model.apply`, restructured so
    every relayout is an MXU matmul or a free reshape:

      * s2d via one-hot row-phase selector matmuls (`_row_phase_selectors`)
        + lane concat — replaces the 2.3 ms strided-slice relayout;
      * the graph runs in the RAW 0..255 domain: 1/255 is absorbed into the
        expanded head kernel, ×255 into the expanded tail kernel;
      * tail and fixed bilinear base emit RGBA-INTERLEAVED phases (alpha
        rides the base bilinearly), so there is no separate alpha matmul and
        no channel concat — one quantize, then the free-reshape d2s.

    Measured ladder at 1080p→4K on tpu4 (tools/experiments/esrgan_surgery3/
    4.py): 6.8 ms (old graph) → ~3.8-4.2 ms. Alpha semantics: bilinear
    phase resample (the old path used nearest) — identical for the α≡255
    frames the capture path produces.

    quant_scales: calibrated activation maxima (`default_trunk_scales`) —
    runs the residual blocks + trunk + tail convs on the int8 MXU path
    (1.53× bf16 conv throughput measured, int8_conv_probe.py); head, fixed
    base, s2d and d2s stay bf16. The float-domain twin for quality eval is
    `make_quant_apply` (same integer weight grid and scales).
    """
    st = model.stride
    up = model.upscale
    r = st * up
    nh, nw = in_h // st, in_w // st
    out_w = in_w * up
    out_h = in_h * up

    p = params["params"] if "params" in params else params
    head_k_np = _expand_in_rgba(
        np.asarray(p["head"]["kernel"], np.float32), st, 1 / 255.0
    )
    # lane efficiency: a 64-in conv measured ~1.7 ms slower than the same
    # conv zero-padded to 128 input channels (esrgan_surgery6.py) — the MXU
    # contraction underfills below 128. Pad the s2d (and the kernel's input
    # rows) when the channel count is 64; 128-multiples stay as-is.
    cin = head_k_np.shape[2]
    pad_c = 128 - cin if cin == 64 else 0
    if pad_c:
        head_k_np = np.concatenate(
            [head_k_np, np.zeros((3, 3, pad_c, head_k_np.shape[-1]), np.float32)],
            axis=2,
        )
    head_k = jnp.asarray(head_k_np)
    head_b = jnp.asarray(np.asarray(p["head"]["bias"], np.float32))
    tk, tb = _expand_out_rgba(
        np.asarray(p["tail"]["kernel"], np.float32),
        np.asarray(p["tail"]["bias"], np.float32), r, 255.0,
    )
    tail_k, tail_b = jnp.asarray(tk), jnp.asarray(tb)
    blocks = []
    i = 0
    while f"block{i}" in p:
        blk = p[f"block{i}"]
        if quant_scales is not None:
            blocks.append(
                tuple(
                    _quant_kernel_i8(np.asarray(blk[c]["kernel"], np.float32))
                    + (jnp.asarray(np.asarray(blk[c]["bias"], np.float32)),
                       quant_scales[f"block{i}/{c}"])
                    for c in ("conv1", "conv2")
                )
            )
        else:
            blocks.append(
                tuple(
                    (jnp.asarray(np.asarray(blk[c]["kernel"], np.float32)),
                     jnp.asarray(np.asarray(blk[c]["bias"], np.float32)))
                    for c in ("conv1", "conv2")
                )
            )
        i += 1
    if quant_scales is not None:
        blocks = [
            tuple((jnp.asarray(kq), jnp.asarray(dq), b, ax) for kq, dq, b, ax in blk)
            for blk in blocks
        ]
        trunk_kq, trunk_dq = _quant_kernel_i8(
            np.asarray(p["trunk"]["kernel"], np.float32)
        )
        trunk_kq, trunk_dq = jnp.asarray(trunk_kq), jnp.asarray(trunk_dq)
        # quantize the EXPANDED tail kernel (×255, RGBA-interleaved): per-
        # channel scales absorb the 255, so the integer grid matches the
        # unexpanded kernel's; alpha outputs are all-zero → kq=0
        tail_kq, tail_dq = _quant_kernel_i8(tk)
        tail_kq, tail_dq = jnp.asarray(tail_kq), jnp.asarray(tail_dq)
        # OPTIONAL head/base int8 ("head"/"base" scale entries, normalized-
        # domain input maxima — 1.0 for u8 frames): the inputs are exact
        # 0..255 integers, so the input grid is a fixed /2 rounding (7-bit)
        # and symmetric quantization keeps both pad semantics (head: SAME
        # zero, base: edge-replicate) intact.
        if "head" in quant_scales:
            head_kq, head_dq = _quant_kernel_i8(head_k_np)
            head_kq, head_dq = jnp.asarray(head_kq), jnp.asarray(head_dq)
        if "base" in quant_scales and not (model.base_impl == "sparse"):
            # run the int8 base on the SAME 128-lane-padded input as the
            # head: the 64-in int8 contraction alone gains nothing (the
            # r3 io probe's zero), but lane-filled it measured −0.20 ms
            # in-context (esrgan_surgery7.py "base int8@128"); the padded
            # kernel rows are zero so edge-padding the zero lanes is exact
            base_k_np = _bilinear_base_kernel(4, up, st).astype(np.float32)
            if pad_c:
                base_k_np = np.concatenate(
                    [base_k_np,
                     np.zeros((3, 3, pad_c, base_k_np.shape[-1]), np.float32)],
                    axis=2,
                )
            base_kq, base_dq = _quant_kernel_i8_dc(base_k_np)
            base_kq, base_dq = jnp.asarray(base_kq), jnp.asarray(base_dq)
    trunk_k = jnp.asarray(np.asarray(p["trunk"]["kernel"], np.float32))
    trunk_b = jnp.asarray(np.asarray(p["trunk"]["bias"], np.float32))
    sels = _row_phase_selectors(in_h, st)
    sparse = model.base_impl == "sparse"
    if sparse:
        center, terms = _sparse_base_terms(4, up, st)
        center_j = jnp.asarray(center, dtype)
        terms_j = [
            (oy, ox, jnp.asarray(a, dtype), jnp.asarray(bm, dtype))
            for (oy, ox, a, bm) in terms
        ]
    else:
        # MEASURED NEGATIVE (r3): folding the base conv INTO the tail conv
        # (stack [tail_k; base_k] on the input-channel axis, one VALID conv
        # over concat(zero-pad(h), edge-pad(s2d)) — exact, and it fills the
        # base's underfilled 64-lane contraction) ran 4.409 vs 4.159 ms
        # end-to-end: the 272×482×192 concat+pad materialization costs more
        # than the lane-fill recovers. Separate tail + base stays.
        base_k = jnp.asarray(_bilinear_base_kernel(4, up, st))

    def conv(x, k, b=None, pad="SAME"):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y if b is None else y + b.astype(x.dtype)

    def fn(img_u8):
        x2d = img_u8.reshape(in_h, in_w * 4).astype(dtype)
        s2d = jnp.concatenate(
            [
                jnp.einsum("or,rw->ow", sels[q].astype(dtype), x2d)
                .reshape(nh, nw, st * 4)[None]
                for q in range(st)
            ],
            axis=-1,
        )  # [1, nh, nw, st²·4] raw-scale
        s2d_head = (
            jnp.concatenate([s2d, jnp.zeros_like(s2d)], axis=-1) if pad_c else s2d
        )
        if quant_scales is not None and "head" in quant_scales:
            feat = _conv_i8(s2d_head, head_kq, head_dq, head_b,
                            255.0 * quant_scales["head"])
        else:
            feat = conv(s2d_head, head_k, head_b)
        h = feat
        if quant_scales is not None:
            for (kq1, dq1, b1, ax1), (kq2, dq2, b2, ax2) in blocks:
                t1 = jax.nn.relu(_conv_i8(h, kq1, dq1, b1, ax1))
                h = h + jnp.asarray(0.2, h.dtype) * _conv_i8(t1, kq2, dq2, b2, ax2)
            h = _conv_i8(h, trunk_kq, trunk_dq, trunk_b,
                         quant_scales["trunk"]) + feat
            tail = _conv_i8(h, tail_kq, tail_dq, tail_b, quant_scales["tail"])
        else:
            for (k1, b1), (k2, b2) in blocks:
                t1 = jax.nn.relu(conv(h, k1, b1))
                h = h + jnp.asarray(0.2, h.dtype) * conv(t1, k2, b2)
            h = conv(h, trunk_k, trunk_b) + feat
            tail = conv(h, tail_k, tail_b)
        if sparse:
            base = jnp.einsum("nhwi,io->nhwo", s2d, center_j)
            for oy, ox, a_m, b_m in terms_j:
                sh = _shift_edge_nhwc(s2d, oy, ox)
                red = jnp.einsum("nhwi,ik->nhwk", sh, a_m)
                base = base + jnp.einsum("nhwk,ko->nhwo", red, b_m)
        else:
            if quant_scales is not None and "base" in quant_scales:
                sp = jnp.pad(
                    s2d_head, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"
                )  # 128-lane int8 base (zero lanes edge-pad to zero — exact)
                base = _conv_i8(sp, base_kq, base_dq, None,
                                255.0 * quant_scales["base"], pad="VALID")
            else:
                sp = jnp.pad(s2d, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
                base = conv(sp, base_k, pad="VALID")
        phases = tail + base  # [1, nh, nw, r²·4] raw-scale RGBA-interleaved
        # quantize in the compute dtype: bf16 phases carry ≤0.5 ulp at the
        # u8 range's top (ulp(bf16)=1.0 in [128,256) — values there are
        # already integers), so rounding before an f32 cast is value-
        # identical to rounding after it and skips materializing a 33 MB
        # f32 tensor when XLA doesn't fuse the cast chain
        ph_u8 = jnp.clip(jnp.round(phases[0]), 0, 255).astype(jnp.uint8)
        rows = [
            ph_u8[..., q * r * 4 : (q + 1) * r * 4].reshape(nh, out_w, 4)
            for q in range(r)
        ]
        return jnp.stack(rows, axis=1).reshape(out_h, out_w, 4)

    return jax.jit(fn)


def make_serving_fn(model, params, in_h, in_w, out_h, out_w, dtype=jnp.bfloat16,
                    quant_scales: dict | None = None):
    """Build the jitted u8 RGBA → u8 RGBA serving function for any
    ESRGANLite/ESRGANLiteTPU instance (used by `make_pretrained_upscaler`
    and by tools/esrgan_arch_sweep.py to time candidate architectures).

    quant_scales routes the exact-ratio fused graph through the int8 trunk
    (`make_serving_fn_fused`); the non-fused fallback paths ignore it."""
    u = getattr(model, "upscale", None) or 2 ** getattr(model, "stages", 1)
    exact = isinstance(model, ESRGANLiteTPU) and (out_h, out_w) == (in_h * u, in_w * u)

    if (
        exact
        and model.conv_impl == "conv"
        and in_h % model.stride == 0
        and in_w % model.stride == 0
    ):
        # the fused raw-domain serving graph (select-matmul s2d, expanded
        # RGBA-interleaved tail+base) — 6.8 → ~4 ms/frame at 1080p→4K.
        # Params stay f32 here: the fused builder derives its own bf16/int8
        # constants, and quantizing UNROUNDED weights keeps the int8 grid
        # identical to the eval twin's (make_quant_apply).
        return make_serving_fn_fused(
            model, params, in_h, in_w, dtype, quant_scales=quant_scales
        )
    params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)

    if exact:
        st = model.stride
        r = st * u
        nh, nw = in_h // st, in_w // st
        # alpha → phase map: output phase p reads the NEAREST s2d alpha
        # channel round((p+0.5)/u − 0.5) — all inside the same trunk cell
        m_alpha = np.zeros((st * st, r * r), np.float32)
        for py in range(r):
            my = int(round((py + 0.5) / u - 0.5))
            for px in range(r):
                mx = int(round((px + 0.5) / u - 0.5))
                m_alpha[my * st + mx, py * r + px] = 1.0
        m_alpha_b = jnp.asarray(m_alpha, jnp.bfloat16)

        def fn(img_u8):
            # the whole 4K product is ONE u8 d2s: RGB phases from the net +
            # alpha phases from a 0/1 channel matmul merge into an RGBA
            # phase tensor (r²·4 = lane-aligned 256 channels for r=8), so
            # there is no 4K channel-minor concat (measured ~30 ms) and no
            # f32 resize anywhere
            rgb = img_u8[None, ..., :3].astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)
            ph = model.apply(params, rgb, phase_domain=True)[0]
            ph_u8 = (
                jnp.clip(jnp.round(ph.astype(jnp.float32) * 255.0), 0, 255)
                .astype(jnp.uint8)
            )
            a_s2d = (
                img_u8[..., 3]
                .reshape(nh, st, nw, st)
                .transpose(0, 2, 1, 3)
                .reshape(nh, nw, st * st)
            )
            a_ph = (
                jnp.einsum("hwi,io->hwo", a_s2d.astype(jnp.bfloat16), m_alpha_b)
                .astype(jnp.uint8)
            )
            combined = jnp.concatenate(
                [ph_u8.reshape(nh, nw, r * r, 3), a_ph[..., None]], axis=-1
            ).reshape(nh, nw, r * r * 4)
            # d2s: per row-phase lane slice → FREE column reshape → row
            # stack. Measured 0.54 ms vs 2.5-4 ms for transpose forms
            # (tools/experiments/d2s_sweep.py).
            rows = [
                combined[..., p * r * 4 : (p + 1) * r * 4].reshape(nh, out_w, 4)
                for p in range(r)
            ]
            return jnp.stack(rows, axis=1).reshape(out_h, out_w, 4)

    else:

        def fn(img_u8):
            f = img_u8.astype(jnp.float32) * (1.0 / 255.0)
            rgb = f[None, ..., :3].astype(dtype)
            out = model.apply(params, rgb)[0].astype(jnp.float32)
            if out.shape[:2] != (out_h, out_w):
                out = jax.image.resize(out, (out_h, out_w, 3), method="bilinear")
            alpha = jax.image.resize(f[..., 3:], (out_h, out_w, 1), method="bilinear")
            full = jnp.concatenate([out, alpha], axis=-1)
            return jnp.clip(jnp.round(full * 255.0), 0, 255).astype(jnp.uint8)

    return jax.jit(fn)
