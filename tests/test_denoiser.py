"""AOV-guided denoiser (analog of reference src/render/optixdenoiser.cpp)."""

import numpy as np
import pytest

from mitsuba3dopplertof_tpu.utils.denoiser import Denoiser, joint_bilateral


def _noisy_scene(h=48, w=48, sigma=0.25, seed=0):
    """Piecewise-constant image + albedo/normal AOVs aligned with the
    discontinuity, plus iid noise."""
    rng = np.random.default_rng(seed)
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, : w // 2] = [0.9, 0.2, 0.1]
    clean[:, w // 2:] = [0.1, 0.3, 0.8]
    albedo = clean.copy()
    normals = np.zeros((h, w, 3), np.float32)
    normals[:, : w // 2] = [0, 0, 1]
    normals[:, w // 2:] = [0.707, 0, 0.707]
    noisy = clean + rng.normal(0, sigma, clean.shape).astype(np.float32)
    return clean, noisy, albedo, normals


def test_denoise_reduces_error_keeps_edge():
    clean, noisy, albedo, normals = _noisy_scene()
    out = np.asarray(joint_bilateral(noisy, albedo, normals))
    err_in = np.abs(noisy - clean).mean()
    err_out = np.abs(out - clean).mean()
    assert err_out < 0.4 * err_in, (err_in, err_out)
    # the guided edge stays sharp: cross-edge difference preserved
    left = out[:, out.shape[1] // 2 - 2].mean(axis=0)
    right = out[:, out.shape[1] // 2 + 1].mean(axis=0)
    assert abs(left[0] - right[0]) > 0.5


def test_denoiser_api_flags():
    with pytest.raises(RuntimeError):
        Denoiser((8, 8), albedo=False, normals=True)   # ref :26-28
    d = Denoiser((16, 16), albedo=True)
    with pytest.raises(RuntimeError):
        d(np.zeros((16, 16, 3), np.float32))           # missing albedo
    with pytest.raises(ValueError):
        Denoiser((8, 8))(np.zeros((16, 16, 3), np.float32))


def test_alpha_passthrough_and_denoise():
    clean, noisy, albedo, normals = _noisy_scene(h=16, w=16)
    rgba = np.concatenate([noisy, np.full_like(noisy[..., :1], 0.5)], -1)
    d = Denoiser((16, 16), albedo=True, normals=True)
    out = np.asarray(d(rgba, albedo=albedo, normals=normals))
    assert out.shape[-1] == 4
    np.testing.assert_allclose(out[..., 3], 0.5, atol=1e-6)


def test_temporal_blend():
    clean, noisy, albedo, normals = _noisy_scene(h=16, w=16)
    d = Denoiser((16, 16), albedo=True, temporal=True, history_weight=0.5)
    a = np.asarray(d(noisy, albedo=albedo))
    flow = np.zeros((16, 16, 2), np.float32)
    _, noisy2, _, _ = _noisy_scene(h=16, w=16, seed=1)
    b = np.asarray(d(noisy2, albedo=albedo, flow=flow))
    solo = np.asarray(joint_bilateral(noisy2, albedo))
    # with zero flow, frame 2 output blends half of frame 1's history
    np.testing.assert_allclose(b, 0.5 * a + 0.5 * solo, atol=1e-5)
