"""Measured polarized pBRDF (VERDICT round-1 item 5; reference
src/bsdfs/measured_polarized.cpp, Baek et al. 2020). The KAIST dataset is
not redistributable, so these tests synthesize .pbsdf tensor files with
analytic content and check the eval semantics (4-D interpolation,
Rusinkiewicz parameterization, Stokes frame rotations, M00 >= 0 and NaN
sanitization) against closed-form expectations."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.vec import Vec3
from mitsuba3dopplertof_tpu.io.tensor_file import write_tensor_file
from mitsuba3dopplertof_tpu.bsdfs.measured_polarized_impl import (
    build_pbsdf_tables, pbsdf_fetch16, pbsdf_eval_mueller,
    pbsdf_eval_pdf_sample, rusinkiewicz)


def _write_pbsdf(path, m_fn, Np=4, Nd=5, Nh=6, wvls=(450, 500, 550, 600, 650)):
    """Synthesize a .pbsdf: M[p,d,h,w] = m_fn(phi_d, theta_d, theta_h, wvl)
    returning a (4,4) matrix."""
    pd = np.linspace(-np.pi, np.pi, Np, dtype=np.float32)
    td = np.linspace(0, np.pi / 2, Nd, dtype=np.float32)
    th = np.linspace(0, np.pi / 2, Nh, dtype=np.float32)
    wv = np.asarray(wvls, np.uint16)
    M = np.zeros((Np, Nd, Nh, len(wvls), 4, 4), np.float32)
    for a, p in enumerate(pd):
        for b, d in enumerate(td):
            for c, h in enumerate(th):
                for e, w in enumerate(wv):
                    M[a, b, c, e] = m_fn(p, d, h, float(w))
    write_tensor_file(str(path), {
        "theta_h": th.reshape(1, -1), "theta_d": td.reshape(1, -1),
        "phi_d": pd.reshape(1, -1), "wvls": wv, "M": M})
    return pd, td, th, wv


def _depol(c):
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = c
    return m


def test_wavelength_and_angle_interpolation(tmp_path):
    """M00 linear in wavelength and theta_h interpolates exactly."""
    f = tmp_path / "lin.pbsdf"
    _write_pbsdf(f, lambda p, d, h, w: _depol((w - 450.0) / 200.0
                                              + 0.5 * h))
    from mitsuba3dopplertof_tpu.io.tensor_file import read_tensor_file
    tbl = build_pbsdf_tables(read_tensor_file(str(f)))
    n = 3
    pd = jnp.zeros(n)
    td = jnp.full(n, 0.3)
    th = jnp.asarray([0.0, 0.25, 0.5])
    lam = jnp.asarray([450.0, 550.0, 630.0])
    out = pbsdf_fetch16(tbl, pd, td, th, lam)
    expect = (np.asarray([450., 550., 630.]) - 450.0) / 200.0 \
        + 0.5 * np.asarray([0.0, 0.25, 0.5])
    np.testing.assert_allclose(np.asarray(out[0]), expect, rtol=1e-4)
    for e in range(1, 16):
        assert np.allclose(np.asarray(out[e]), 0.0)


def test_depolarizer_table_eval_mueller(tmp_path):
    """A pure-depolarizer table stays a depolarizer under all the frame
    rotations (the S0 row/column are rotation-invariant) and picks up the
    cosine foreshortening."""
    f = tmp_path / "dep.pbsdf"
    _write_pbsdf(f, lambda p, d, h, w: _depol(0.7))
    from mitsuba3dopplertof_tpu.io.tensor_file import read_tensor_file
    tbl = build_pbsdf_tables(read_tensor_file(str(f)))
    rng = np.random.default_rng(0)
    n = 64
    wi_d = rng.normal(size=(n, 3))
    wi_d[:, 2] = np.abs(wi_d[:, 2]) + 0.1
    wi_d /= np.linalg.norm(wi_d, axis=1, keepdims=True)
    wo_d = rng.normal(size=(n, 3))
    wo_d[:, 2] = np.abs(wo_d[:, 2]) + 0.1
    wo_d /= np.linalg.norm(wo_d, axis=1, keepdims=True)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    wi = Vec3(f32(wi_d[:, 0]), f32(wi_d[:, 1]), f32(wi_d[:, 2]))
    wo = Vec3(f32(wo_d[:, 0]), f32(wo_d[:, 1]), f32(wo_d[:, 2]))
    M = pbsdf_eval_mueller(tbl, wi, wo)
    np.testing.assert_allclose(np.asarray(M[0].x), 0.7 * wo_d[:, 2],
                               rtol=1e-4)
    for e in range(1, 16):
        assert np.abs(np.asarray(M[e].x)).max() < 1e-4, e


def test_nan_cells_sanitized(tmp_path):
    """Invalid (NaN) cells zero the interpolated matrix
    (measured_polarized.cpp:283-287)."""
    f = tmp_path / "nan.pbsdf"

    def m_fn(p, d, h, w):
        if h > 0.4:
            return np.full((4, 4), np.nan, np.float32)
        return _depol(1.0)
    _write_pbsdf(f, m_fn)
    from mitsuba3dopplertof_tpu.io.tensor_file import read_tensor_file
    tbl = build_pbsdf_tables(read_tensor_file(str(f)))
    out = pbsdf_fetch16(tbl, jnp.zeros(2), jnp.full(2, 0.3),
                        jnp.asarray([0.1, 1.2]), jnp.full(2, 550.0))
    vals = np.asarray(out[0])
    assert np.isfinite(vals).all()
    assert vals[0] > 0.5 and vals[1] == 0.0


def test_sampling_chi2(tmp_path):
    """The cosine/GGX mixture sampling matches its pdf."""
    from mitsuba3dopplertof_tpu.utils.chi2 import (ChiSquareTest,
                                                   SphericalDomain)
    from mitsuba3dopplertof_tpu.bsdfs.measured_polarized_impl import (
        _mixture_pdf)
    f = tmp_path / "c.pbsdf"
    _write_pbsdf(f, lambda p, d, h, w: _depol(0.5))
    from mitsuba3dopplertof_tpu.io.tensor_file import read_tensor_file
    tbl = build_pbsdf_tables(read_tensor_file(str(f)))
    alpha = jnp.float32(0.3)
    wi1 = np.array([0.3, 0.1, np.sqrt(1 - 0.09 - 0.01)])

    def sample(n):
        rng = np.random.RandomState(7)
        s = rng.rand(n, 3).astype(np.float32)
        wi = Vec3(jnp.full(n, wi1[0], jnp.float32),
                  jnp.full(n, wi1[1], jnp.float32),
                  jnp.full(n, wi1[2], jnp.float32))
        r = pbsdf_eval_pdf_sample(tbl, jnp.full(n, alpha), wi,
                                  Vec3(jnp.zeros(n), jnp.zeros(n),
                                       jnp.ones(n)),
                                  jnp.asarray(s[:, 0]),
                                  jnp.asarray(s[:, 1]),
                                  jnp.asarray(s[:, 2]))
        return np.stack([np.asarray(r.wo.x), np.asarray(r.wo.y),
                         np.asarray(r.wo.z)], -1)

    def pdf(d):
        n = d.shape[0]
        wi = Vec3(jnp.full(n, wi1[0], jnp.float32),
                  jnp.full(n, wi1[1], jnp.float32),
                  jnp.full(n, wi1[2], jnp.float32))
        wo = Vec3(jnp.asarray(d[:, 0], jnp.float32),
                  jnp.asarray(d[:, 1], jnp.float32),
                  jnp.asarray(d[:, 2], jnp.float32))
        # raw sampling density (below-horizon GGX reflections are real
        # samples with zero BSDF weight, so the chi2 must include them)
        return np.asarray(_mixture_pdf(wi, wo, jnp.full(n, alpha),
                                       clip=False))

    t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_count=200_000,
                      res=15)
    assert t.run(), t.messages


def test_render_rgb_and_polarized(tmp_path):
    """End-to-end: a measured_polarized sphere renders in tpu_rgb (scalar
    M00 path) and produces Stokes AOVs under the stokes integrator in the
    polarized variant."""
    f = tmp_path / "mat.pbsdf"

    def m_fn(p, d, h, w):
        m = _depol(0.6 * np.exp(-8.0 * h * h))
        m[1, 1] = 0.3 * m[0, 0]     # mild linear-polarization memory
        return m
    _write_pbsdf(f, m_fn)

    def scene():
        return mi.load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": tf.look_at([0, 0, -4], [0, 0, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 16,
                                "height": 16},
                       "sampler": {"type": "independent",
                                   "sample_count": 32}},
            "ball": {"type": "sphere",
                     "bsdf": {"type": "measured_polarized",
                              "filename": str(f),
                              "alpha_sample": 0.2}},
            "light": {"type": "point", "position": [2, 3, -3],
                      "intensity": {"type": "rgb", "value": 30.0}},
        })

    img = np.asarray(mi.render(scene(), seed=0))
    assert np.isfinite(img).all()
    assert img[..., :3].max() > 0.01

    mi.set_variant("tpu_rgb_polarized")
    try:
        sc = scene()
        integ = mi.load_dict({"type": "stokes",
                              "integrator": {"type": "path",
                                             "max_depth": 3}})
        img_s = np.asarray(mi.render(sc, seed=0, integrator=integ))
        assert np.isfinite(img_s).all()
        assert img_s[..., :3].max() > 0.01        # S0
    finally:
        mi.set_variant("tpu_rgb")
