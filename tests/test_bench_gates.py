"""The bench's hard per-path fidelity gates (VERDICT r3 #1).

`bench.run_fidelity_gates` must (a) pass on the shipped kernels, (b) record a
`psnr_<path>_db` key per production output path, and (c) turn a deliberately
broken kernel — or a crashing one — into a recorded failure that makes
bench.py exit non-zero (the r3 version swallowed its own assert).

Runs at small tile-divisible shapes on the CPU mesh; the driver's bench run
executes the same gates at 1080p→4K on the real chip.
"""

import numpy as np
import pytest

import bench
from nu_scaler_tpu.ops import resample


@pytest.fixture
def small_dims(monkeypatch):
    # tile-divisible by the (8, 128) warp tile with >= 2 tiles per axis so
    # the Pallas-path routing conditions in soft_interp_fast hold
    monkeypatch.setattr(bench, "IN_H", 32)
    monkeypatch.setattr(bench, "IN_W", 256)
    monkeypatch.setattr(bench, "OUT_H", 64)
    monkeypatch.setattr(bench, "OUT_W", 512)


def test_gates_pass_on_shipped_kernels(small_dims):
    extras: dict = {}
    failures: list = []
    bench.run_fidelity_gates(extras, failures)
    assert failures == [], failures
    # per-path thresholds (FSR skips the reference's intermediate rgba8
    # texture round-trip — bounded ±2 LSB vs the quantizing golden, so its
    # contract is PSNR >= 40 + max|diff| <= 3, enforced inside the gate)
    for key, thresh in (
        ("psnr_bilinear_db", 50.0),
        ("psnr_bicubic_db", 50.0),
        ("psnr_lanczos3_db", 50.0),
        ("psnr_fsr_db", 40.0),
        ("psnr_blend_db", 50.0),
        ("psnr_flow_soft_db", 50.0),
    ):
        assert key in extras, (key, extras)
        assert extras[key] >= thresh, (key, extras[key])
    # learned tiers gate when their checkpoints are committed (they are)
    if "psnr_esrgan_db" in extras:
        assert extras["psnr_esrgan_db"] >= 42.0
    if "psnr_flow_soft_ref_db" in extras:
        assert extras["psnr_flow_soft_ref_db"] >= 50.0


def test_broken_kernel_fails_the_gate(small_dims, monkeypatch):
    """A resampler regression below the 50 dB contract must be RECORDED as a
    failure (which main() turns into a non-zero exit), not logged and
    forgotten."""
    real = resample.make_resampler

    def corrupting(in_h, in_w, out_h, out_w, algorithm, *a, **kw):
        fn = real(in_h, in_w, out_h, out_w, algorithm, *a, **kw)
        if algorithm != "bicubic":
            return fn

        def broken(x):
            out = fn(x)
            return out // 2  # eat a bit — way below any PSNR gate

        return broken

    monkeypatch.setattr(bench.resample, "make_resampler", corrupting)
    extras: dict = {}
    failures: list = []
    bench.run_fidelity_gates(extras, failures)
    assert any("psnr_bicubic_db" in f for f in failures), failures


def test_crashing_kernel_is_a_failure_not_an_escape(small_dims, monkeypatch):
    """A gate whose path crashes outright must also fail the run — breaking a
    kernel by making it raise must not read as 'gate skipped'."""

    def boom(*a, **kw):
        raise RuntimeError("kernel exploded")

    monkeypatch.setattr(bench.fsr_ops, "make_fsr_upscaler", boom)
    extras: dict = {}
    failures: list = []
    bench.run_fidelity_gates(extras, failures)
    assert any(f.startswith("psnr_fsr_db: crashed") for f in failures), failures
