"""Color/spectrum helpers for the RGB variant.

The flagship variant of this framework is RGB (the reference's Doppler work
targets cuda_rgb/llvm_rgb — reference README.md:13); spectral upsampling
hooks live here so a spectral variant can be added without touching callers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def luminance(rgb):
    """ITU-R BT.709 luminance, matching reference include/mitsuba/core/spectrum.h."""
    w = jnp.asarray([0.212671, 0.715160, 0.072169], dtype=jnp.float32)
    return jnp.sum(rgb * w, axis=-1)


def luminance_np(rgb: np.ndarray) -> np.ndarray:
    w = np.asarray([0.212671, 0.715160, 0.072169], dtype=np.float64)
    return rgb @ w


def srgb_to_linear(c):
    c = jnp.asarray(c)
    return jnp.where(c <= 0.04045, c / 12.92,
                     ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    c = jnp.asarray(c)
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * jnp.maximum(c, 1e-8) ** (1.0 / 2.4) - 0.055)


__all__ = ["luminance", "luminance_np", "srgb_to_linear", "linear_to_srgb"]
