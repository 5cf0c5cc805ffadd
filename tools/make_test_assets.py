"""Generate the committed golden image artifacts (the role of the
reference's test_input.png / test_output.png / interp_half.png assets,
SURVEY §2.5 "Test assets"): visual regression anchors for the kernels.

    python -m tools.make_test_assets          # writes into assets/
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nu_scaler_tpu.bench.harness import generate_test_pattern
    from nu_scaler_tpu.ops import interpolate, resample

    os.makedirs(ASSETS, exist_ok=True)

    inp = generate_test_pattern(320, 240)
    Image.fromarray(inp, "RGBA").save(os.path.join(ASSETS, "test_input.png"))

    for algo in ("bilinear", "lanczos3"):
        out = np.asarray(resample.upscale_frame(inp, 480, 640, algo))
        Image.fromarray(out, "RGBA").save(
            os.path.join(ASSETS, f"test_output_{algo}.png")
        )

    # interpolation golden: gradient vs its horizontal mirror at t=0.5
    a = generate_test_pattern(128, 128)
    b = a[:, ::-1].copy()
    mid = np.asarray(interpolate.interpolate_frames(a, b, 0.5, mode="blend"))
    Image.fromarray(mid, "RGBA").save(os.path.join(ASSETS, "interp_half.png"))
    print(f"wrote assets to {ASSETS}")


if __name__ == "__main__":
    main()
