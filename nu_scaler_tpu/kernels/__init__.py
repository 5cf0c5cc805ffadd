"""Pallas kernels and numpy golden references for the NU_Scaler TPU rebuild.

Each kernel family has:
  * a numpy "golden" in `reference.py` encoding the exact semantics of the
    reference WGSL shader it replaces (file:line citations in docstrings),
  * a JAX/XLA implementation in `ops/` (jit-compiled, fused by XLA),
  * where profitable, a hand-tiled Pallas TPU kernel here.
"""
