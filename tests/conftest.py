"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before the first `import jax` anywhere in the test
process. The CPU backend plays the role the reference gave its mock GPU
adapters (SURVEY §4): deterministic, always available, no real chips needed.
"""

import os

# The session env pins JAX_PLATFORMS=axon (the real TPU tunnel) and a
# sitecustomize re-appends it; tests must run on the virtual 8-device CPU
# mesh, so override both the env var and the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compile cache: XLA:CPU compiles of the flow pipeline are slow;
# cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def gradient_pattern(width: int, height: int) -> np.ndarray:
    """The reference benchmark's test pattern (benchmark.rs:188-207)."""
    x = np.arange(width, dtype=np.uint64)
    y = np.arange(height, dtype=np.uint64)
    r = (x * 255 // width).astype(np.uint8)[None, :]
    g = (y * 255 // height).astype(np.uint8)[:, None]
    b = ((x[None, :] + y[:, None]) * 255 // (width + height)).astype(np.uint8)
    img = np.empty((height, width, 4), dtype=np.uint8)
    img[..., 0] = r
    img[..., 1] = g
    img[..., 2] = b
    img[..., 3] = 255
    return img


@pytest.fixture
def pattern():
    return gradient_pattern
