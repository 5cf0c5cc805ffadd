"""nu_scaler — application layer (the reference's `nu_scaler_py/nu_scaler`
package, SURVEY §2.2 P1-P8) over the TPU-backed `nu_scaler_core`.

Modules:
    benchmark     — benchmark wrappers + plots + CSV (P3)
    benchmark_app — argparse CLI: single / compare / batch (P4)
    gpu_optimizer — device wake-up + monitor thread + tuning (P5)
    live          — headless live pipeline loop (the engine behind P1's GUI)
    profiles      — named settings profiles persisted as JSON (legacy
                    Nu_scale/src/ui/profile.rs role)
    logger        — timestamped file logger (legacy Nu_scale/src/logger.rs role)
    core          — Engine/Capture/Upscaler/Renderer facade (P7, implemented —
                    the reference left it as empty placeholder classes)
    gui           — PySide6 GUI entry (requires PySide6; the env here has none)
"""

__version__ = "0.1.0"
