"""Jitted JAX op compositions — the engine-service layer (reference L3)."""
