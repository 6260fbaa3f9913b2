"""Measured (RGL tensor-format) BRDF: tensor file IO + warp chain + full
render parity against the analytic GGX conductor the data was synthesized
from (reference src/bsdfs/measured.cpp, src/core/tensor.cpp)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.io.tensor_file import (read_tensor_file,
                                                   write_tensor_file)
from mitsuba3dopplertof_tpu.bsdfs import measured_impl as MI

ALPHA = 0.3
ETA_K = {611.0: (0.2004, 3.9129), 549.0: (0.9240, 2.4528),
         465.0: (1.1022, 2.1421)}                       # Cu-like
WAVS = np.array([465.0, 549.0, 611.0], np.float32)


def _D(ct):
    ct = np.clip(ct, 1e-6, 1.0)
    a2 = ALPHA * ALPHA
    return a2 / (np.pi * (ct * ct * (a2 - 1) + 1) ** 2)


def _G1(ct):
    ct = np.clip(ct, 1e-6, 1.0)
    st = np.sqrt(1 - ct * ct)
    return 1.0 / (1.0 + 0.5 * (-1 + np.sqrt(1 + (ALPHA * st / ct) ** 2)))


def _fresnel(ci, e, k):
    ci2 = ci * ci
    si2 = 1 - ci2
    e2, k2 = e * e, k * k
    t0 = e2 - k2 - si2
    a2pb2 = np.sqrt(np.maximum(t0 * t0 + 4 * e2 * k2, 0))
    t1 = a2pb2 + ci2
    a = np.sqrt(np.maximum(0.5 * (a2pb2 + t0), 0))
    t2 = 2 * a * ci
    Rs = (t1 - t2) / (t1 + t2)
    t3 = ci2 * a2pb2 + si2 * si2
    t4 = t2 * si2
    return 0.5 * (Rs + Rs * (t3 - t4) / (t3 + t4))


@pytest.fixture(scope="module")
def bsdf_file(tmp_path_factory):
    """Synthesize a GGX-copper .bsdf via the actual warp chain so the
    stored spectra are exactly self-consistent with the sampler."""
    T, R, S = 24, 48, 48
    theta_i = (np.linspace(0, 1, T) ** 2) * (np.pi / 2 * 0.98)
    phi_i = np.array([0.0], np.float32)
    u = np.linspace(0, 1, R)
    th_m = u ** 2 * (np.pi / 2)
    ndf = np.tile(_D(np.cos(th_m))[None, :], (R, 1)).astype(np.float32)
    sigma = np.tile((np.cos(th_m) / _G1(np.cos(th_m)))[None, :],
                    (R, 1)).astype(np.float32)
    vndf = np.zeros((1, T, R, R), np.float32)
    for t, ti in enumerate(theta_i):
        wi = np.array([np.sin(ti), 0, np.cos(ti)])
        PH, TH = np.meshgrid((2 * u - 1) * np.pi, th_m, indexing="ij")
        m = np.stack([np.cos(PH) * np.sin(TH), np.sin(PH) * np.sin(TH),
                      np.cos(TH)], -1)
        dvis = (_D(np.cos(TH)) * np.maximum(m @ wi, 0)
                / max(np.cos(ti) / _G1(np.cos(ti)), 1e-9))
        jac = 2 * np.pi ** 2 * np.tile(u[None, :], (R, 1)) * np.sin(TH)
        vndf[0, t] = (dvis * jac).astype(np.float32)
    lum = np.ones((1, T, S, S), np.float32)
    tbl = MI.build_tables({
        "phi_i": phi_i, "theta_i": theta_i.astype(np.float32),
        "wavelengths": WAVS, "vndf": vndf, "luminance": lum, "ndf": ndf,
        "sigma": sigma, "spectra": np.zeros((1, T, 3, S, S), np.float32),
        "jacobian": np.array([1], np.uint8)})
    gx, gy = np.meshgrid(np.linspace(0, 1, S), np.linspace(0, 1, S))
    spectra = np.zeros((1, T, 3, S, S), np.float32)
    for t, ti in enumerate(theta_i):
        ids, wts = MI._corner_ids(tbl, jnp.full(S * S, 0.0),
                                  jnp.full(S * S, float(ti)))
        ux, uy, _ = MI.warp_sample(
            tbl.vndf, ids, wts, jnp.asarray(gx.ravel(), jnp.float32),
            jnp.asarray(gy.ravel(), jnp.float32))
        ux, uy = np.asarray(ux), np.asarray(uy)
        thm = ux ** 2 * (np.pi / 2)
        phm = (2 * uy - 1) * np.pi
        m = np.stack([np.cos(phm) * np.sin(thm), np.sin(phm) * np.sin(thm),
                      np.cos(thm)], -1)
        wi = np.array([np.sin(ti), 0, np.cos(ti)])
        wo = 2 * (m @ wi)[:, None] * m - wi[None, :]
        ci = max(np.cos(ti), 1e-6)
        co = np.clip(wo[:, 2], 1e-6, 1)
        D = _D(np.clip(m[:, 2], 1e-6, 1))
        G = _G1(ci) * _G1(co)
        sig = ci / _G1(ci)
        for w, lam in enumerate(WAVS):
            e, k = ETA_K[float(lam)]
            F = _fresnel(np.clip(m @ wi, 1e-6, 1), e, k)
            fcos = D * F * G / (4 * ci * co) * co      # f_r * cos_o
            val = np.where(wo[:, 2] > 1e-4,
                           fcos * 4 * sig / np.maximum(D, 1e-9), 0.0)
            spectra[0, t, w] = val.reshape(S, S)
    path = str(tmp_path_factory.mktemp("rgl") / "ggx_cu.bsdf")
    write_tensor_file(path, {
        "phi_i": phi_i, "theta_i": theta_i.astype(np.float32),
        "wavelengths": WAVS, "ndf": ndf, "sigma": sigma, "vndf": vndf,
        "luminance": lum, "spectra": spectra,
        "jacobian": np.array([1], np.uint8),
        "description": np.frombuffer(b"synthetic GGX Cu", np.uint8)})
    return path


def test_tensor_file_roundtrip(bsdf_file):
    f = read_tensor_file(bsdf_file)
    assert set(f) >= {"phi_i", "theta_i", "ndf", "sigma", "vndf",
                      "luminance", "spectra", "wavelengths", "jacobian"}
    assert f["vndf"].dtype == np.float32 and f["vndf"].ndim == 4


def test_warp_sample_invert_roundtrip(bsdf_file):
    tbl = MI.build_tables(read_tensor_file(bsdf_file))
    n = 512
    rng = np.random.default_rng(0)
    ux = jnp.asarray(rng.uniform(0.01, 0.99, n), jnp.float32)
    uy = jnp.asarray(rng.uniform(0.01, 0.99, n), jnp.float32)
    ids, wts = MI._corner_ids(tbl, jnp.zeros(n), jnp.full(n, 0.7))
    x, y, pdf_s = MI.warp_sample(tbl.vndf, ids, wts, ux, uy)
    ux2, uy2, pdf_i = MI.warp_invert(tbl.vndf, ids, wts, x, y)
    assert np.abs(np.asarray(ux2) - np.asarray(ux)).max() < 1e-3
    assert np.abs(np.asarray(uy2) - np.asarray(uy)).max() < 1e-3
    assert np.allclose(np.asarray(pdf_s), np.asarray(pdf_i), rtol=1e-3)


def test_measured_matches_analytic_ggx(bsdf_file):
    """Render parity: the measured BSDF reproduces the analytic GGX copper
    it was synthesized from (within warp-grid interpolation error)."""
    from mitsuba3dopplertof_tpu.core import transform as tf

    def sc(bsdf):
        return mi.load_dict({
            "type": "scene",
            "obj": {"type": "sphere", "center": [0, 0, 0], "radius": 1.0,
                    "bsdf": bsdf},
            "light": {"type": "point", "position": [3, 3, -3],
                      "intensity": {"type": "rgb", "value": 30.0}},
            "env": {"type": "constant",
                    "radiance": {"type": "rgb", "value": 0.1}},
            "sensor": {"type": "perspective", "fov": 40,
                       "to_world": tf.look_at([0, 0, -4], [0, 0, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 16,
                                "height": 16},
                       "sampler": {"type": "independent",
                                   "sample_count": 64}},
            "integrator": {"type": "path", "max_depth": 3}})

    s1 = sc({"type": "measured", "filename": bsdf_file})
    a = np.asarray(s1.integrator.render(s1, seed=0, spp=128))
    s2 = sc({"type": "roughconductor", "alpha": ALPHA,
             "distribution": "ggx",
             "eta": {"type": "rgb", "value": [0.2004, 0.9240, 1.1022]},
             "k": {"type": "rgb", "value": [3.9129, 2.4528, 2.1421]}})
    b = np.asarray(s2.integrator.render(s2, seed=0, spp=128))
    rel = np.abs(a[..., :3] - b[..., :3]).mean() / b[..., :3].mean()
    assert rel < 0.05, rel
    for c in range(3):
        assert abs(a[..., c].mean() / b[..., c].mean() - 1.0) < 0.03
