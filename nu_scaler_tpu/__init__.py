"""nu_scaler_tpu — TPU-native internals of the NU_Scaler rebuild.

Layer map (bottom→top), mirroring the reference architecture
(see /root/repo/SURVEY.md §1) re-designed for TPU:

    kernels/   Pallas kernels + numpy reference implementations (the WGSL layer, L2)
    ops/       jitted JAX compositions: resample, interpolate, fsr, metrics (L3 engine)
    runtime/   device detection, HBM stats, streaming, native frame ring (L1)
    capture/   frame sources: synthetic/file/video + ScreenCapture semantics (L3 capture)
    bench/     benchmark harness (L3 benchmark)
    models/    learned "quality" tier (ESRGAN-lite, flax)
    parallel/  device mesh, shard_map batch parallelism (TPU-native replacement for
               the reference's rayon par_iter batch path)

The user-facing, reference-API-compatible surface lives in the sibling
`nu_scaler_core` package.
"""

__version__ = "0.1.0"
