"""ToF modulation waveform tables.

Port of the reference's waveform utilities
(reference include/mitsuba/render/waveform_utils.h:24-62):

  g(t)/s(t)  — illumination / sensor modulation, period 2*pi
  L(t)       — low-pass of s*g (the correlation waveform)

All functions are pure jnp and branch via lax-free selects, so they fuse into
the surrounding integrator epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import PI, TWO_PI

WAVE_SINUSOIDAL = 0
WAVE_RECTANGULAR = 1
WAVE_TRIANGULAR = 2
WAVE_TRAPEZOIDAL = 3

WAVEFORM_TYPES = {
    "sinusoidal": WAVE_SINUSOIDAL,
    "rectangular": WAVE_RECTANGULAR,
    "triangular": WAVE_TRIANGULAR,
    "trapezoidal": WAVE_TRAPEZOIDAL,
}


def eval_modulation(t, wave_type: int):
    """g(t) or s(t) — reference waveform_utils.h:24-33. ``wave_type`` static."""
    t = jnp.mod(t, TWO_PI)
    if wave_type == WAVE_SINUSOIDAL:
        return jnp.cos(t)
    if wave_type == WAVE_RECTANGULAR:
        return jnp.where(jnp.abs(t - PI) > 0.5 * PI, 1.0, -1.0)
    if wave_type == WAVE_TRIANGULAR:
        return jnp.where(t < PI, 1.0 - 2.0 * t / PI, -3.0 + 2.0 * t / PI)
    # trapezoidal has no direct g/s in the reference; falls back to cos
    return jnp.cos(t)


def eval_modulation_low_pass(t, wave_type: int):
    """L(t) = lowpass(s*g) — reference waveform_utils.h:36-62."""
    t = jnp.mod(t, TWO_PI)
    if wave_type == WAVE_SINUSOIDAL:
        return jnp.cos(t)
    a = t / PI
    c = jnp.minimum(a, 2.0 - a)
    if wave_type == WAVE_RECTANGULAR:
        return 2.0 - 4.0 * c
    if wave_type == WAVE_TRIANGULAR:
        return (4.0 * c * c * c - 6.0 * c * c + 1.0) * (2.0 / 3.0)
    if wave_type == WAVE_TRAPEZOIDAL:
        return jnp.clip(2.0 * (2.0 - 4.0 * c), -2.0, 2.0)
    return jnp.cos(t)


__all__ = [
    "WAVE_SINUSOIDAL", "WAVE_RECTANGULAR", "WAVE_TRIANGULAR",
    "WAVE_TRAPEZOIDAL", "WAVEFORM_TYPES",
    "eval_modulation", "eval_modulation_low_pass",
]
