"""Learned upscaler models (ESRGAN-lite flax)."""
