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
        ("psnr_yuv420_deliver_db", 50.0),
        ("psnr_yuv420_ingest_db", 50.0),
        ("psnr_flow_soft_db", 50.0),
        ("psnr_soft3x_mids_db", 50.0),
    ):
        assert key in extras, (key, extras)
        assert extras[key] >= thresh, (key, extras[key])
    # learned tiers gate when their checkpoints are committed (they are)
    if "psnr_esrgan_vs_twin_db" in extras:
        assert extras["psnr_esrgan_vs_twin_db"] >= 42.0
    if "psnr_esrgan_x4_vs_twin_db" in extras:
        # 40, not 42: measured association noise of the 52k checkpoint's
        # int8 grid is 41.9 on the CPU mesh (see the gate's comment)
        assert extras["psnr_esrgan_x4_vs_twin_db"] >= 40.0
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


# ---------------------------------------------------------------------------
# main()-level contracts (VERDICT r4 #1/#3): incremental JSON + hard failures
# ---------------------------------------------------------------------------

import json


_DUMMY_LIVE = {
    "fps": 5.0, "presented_fps": 3.0, "p50_step_ms": 10.0, "p99_step_ms": 12.0,
    "skipped": 0, "presented": 10, "output_frames": 10,
    "delivery": "yuv420@64x512", "payload_mb_in": 0.1, "payload_mb_out": 0.1,
    "target_fps": 10.0, "link_mb_s": 49.0,
}


def _mock_main_deps(monkeypatch, retry=None):
    import nu_scaler_tpu.models.esrgan_lite as el
    import nu_scaler_tpu.models.interp_refine as ir

    monkeypatch.setattr(
        bench, "bench_pipeline_retry",
        retry or (lambda mode, iters, overhead: {"fps": 100.0, "step_ms": 1.0}),
    )
    monkeypatch.setattr(bench, "bench_upscale", lambda *a, **k: 100.0)
    monkeypatch.setattr(bench, "bench_fsr", lambda *a, **k: 100.0)
    monkeypatch.setattr(bench, "bench_live", lambda *a, **k: dict(_DUMMY_LIVE))
    monkeypatch.setattr(
        bench, "run_fidelity_gates",
        lambda extras, failures, budget_left_s=None: None,
    )
    monkeypatch.setattr(el, "make_pretrained_upscaler", lambda *a, **k: None)
    monkeypatch.setattr(el, "make_fast_upscaler", lambda *a, **k: None)
    monkeypatch.setattr(ir, "refine_available", lambda: False)


def test_failed_pipeline_mode_fails_main(small_dims, monkeypatch, capsys):
    """A pipeline mode that raises (after its transient retry) must land in
    gate_failures and exit non-zero — never a silently-zeroed line
    (VERDICT r4 #3). The JSON line still prints first, marked FAIL."""

    def retry(mode, iters, overhead):
        if mode == "soft3x":
            raise RuntimeError("kernel exploded")
        return {"fps": 100.0, "step_ms": 1.0}

    _mock_main_deps(monkeypatch, retry=retry)
    monkeypatch.setenv("NU_BENCH_BUDGET_S", "600")
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 1
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    recs = [json.loads(l) for l in lines]
    assert all("value" in r for r in recs)
    final = recs[-1]
    assert "partial" not in final
    assert final["fidelity_gate"].startswith("FAIL")
    assert "pipeline_soft3x" in final["fidelity_gate"]
    # every intermediate record is a parseable superset marked partial
    for r in recs[:-1]:
        assert r.get("partial") is True


def test_budget_skips_optional_sections_and_exits_zero(
    small_dims, monkeypatch, capsys
):
    """With the wall budget already spent, optional tiers are SKIPPED (not
    failed): the run exits 0 and the record lists them under "skipped"
    (VERDICT r4 #1 — a cold-cache driver run must land a parseable JSON)."""
    _mock_main_deps(monkeypatch)
    monkeypatch.setenv("NU_BENCH_BUDGET_S", "0")
    bench.main()  # no SystemExit — nothing failed
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    final = json.loads(lines[-1])
    assert "partial" not in final
    assert final["fidelity_gate"] == "pass"
    assert final["value"] == 100.0
    assert "pipeline_flow_soft" in final.get("skipped", [])
    # required sections still ran: headline + classical + live + gates
    assert final["blend_fused_kernel_fps"] == 100.0
    assert final["upscale_lanczos3_fps"] == 100.0
    assert final["live_host_fps"] == 5.0
