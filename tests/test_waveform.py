"""Waveform tables vs closed forms (reference waveform_utils.h:24-62)."""

import numpy as np
import jax.numpy as jnp

from mitsuba3dopplertof_tpu.core.waveform import (
    WAVE_SINUSOIDAL, WAVE_RECTANGULAR, WAVE_TRIANGULAR, WAVE_TRAPEZOIDAL,
    eval_modulation, eval_modulation_low_pass)

T = jnp.linspace(0.0, 4.0 * np.pi, 4097)


def test_sinusoidal():
    assert np.allclose(np.asarray(eval_modulation(T, WAVE_SINUSOIDAL)),
                       np.cos(np.asarray(T) % (2 * np.pi)), atol=1e-5)
    assert np.allclose(np.asarray(eval_modulation_low_pass(T, WAVE_SINUSOIDAL)),
                       np.cos(np.asarray(T) % (2 * np.pi)), atol=1e-5)


def test_rectangular():
    t = np.asarray(T) % (2 * np.pi)
    expect = np.where(np.abs(t - np.pi) > 0.5 * np.pi, 1.0, -1.0)
    assert np.allclose(np.asarray(eval_modulation(T, WAVE_RECTANGULAR)), expect)
    # low-pass of square*square = triangle in [-2, 2]
    lp = np.asarray(eval_modulation_low_pass(T, WAVE_RECTANGULAR))
    assert lp.min() >= -2.0 - 1e-5 and lp.max() <= 2.0 + 1e-5
    assert abs(lp[0] - 2.0) < 1e-4  # c=0 -> 2


def test_triangular():
    t = np.asarray(T) % (2 * np.pi)
    expect = np.where(t < np.pi, 1 - 2 * t / np.pi, -3 + 2 * t / np.pi)
    assert np.allclose(np.asarray(eval_modulation(T, WAVE_TRIANGULAR)), expect,
                       atol=1e-5)
    # low-pass cubic: (4c^3 - 6c^2 + 1) * 2/3
    c = np.minimum(t / np.pi, 2 - t / np.pi)
    expect_lp = (4 * c ** 3 - 6 * c ** 2 + 1) * 2.0 / 3.0
    assert np.allclose(
        np.asarray(eval_modulation_low_pass(T, WAVE_TRIANGULAR)), expect_lp,
        atol=1e-5)


def test_trapezoidal_lowpass_clamped():
    lp = np.asarray(eval_modulation_low_pass(T, WAVE_TRAPEZOIDAL))
    assert lp.min() >= -2.0 - 1e-6 and lp.max() <= 2.0 + 1e-6
    t = np.asarray(T) % (2 * np.pi)
    c = np.minimum(t / np.pi, 2 - t / np.pi)
    expect = np.clip(2.0 * (2 - 4 * c), -2.0, 2.0)
    assert np.allclose(lp, expect, atol=1e-5)


def test_modulation_weight_formula():
    """dopplertofpath.cpp:60-77 low-pass weight closed form."""
    from mitsuba3dopplertof_tpu.core.properties import Properties
    from mitsuba3dopplertof_tpu.integrators import DopplerToFPathIntegrator
    p = Properties("dopplertofpath")
    p["w_g"] = 30.0
    p["hetero_frequency"] = 1.0
    p["hetero_offset"] = 0.25
    integ = DopplerToFPathIntegrator(p)
    t = jnp.asarray([0.0, 0.0005, 0.001])
    pl = jnp.asarray([1.0, 2.0, 3.0])
    got = np.asarray(integ.eval_modulation_weight(t, pl))
    w_d = 2 * np.pi / 0.0015 * 1.0
    phi = 2 * np.pi * 30.0 / 300.0 * np.asarray(pl)
    arg = w_d * np.asarray(t) + 0.25 * 2 * np.pi + phi
    expect = 0.25 * np.cos(arg % (2 * np.pi))
    assert np.allclose(got, expect, atol=1e-5)
