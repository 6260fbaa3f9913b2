"""Chi-square GOF tests for warps and BSDF sampling — the reference's
statistical test strategy (SURVEY.md §4, reference chi2.py + BSDF tests)."""

import numpy as np
import jax.numpy as jnp

from mitsuba3dopplertof_tpu.utils.chi2 import (ChiSquareTest,
                                               SphericalDomain, PlanarDomain)
from mitsuba3dopplertof_tpu.core import warp
from mitsuba3dopplertof_tpu.core.vec import Vec3


def _rng(n, d, seed=0):
    return np.random.RandomState(seed).rand(n, d).astype(np.float32)


def test_cosine_hemisphere_chi2():
    def sample(n):
        s = _rng(n, 2)
        v = warp.cosine_hemisphere_c(jnp.asarray(s[:, 0]), jnp.asarray(s[:, 1]))
        return np.stack([np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)],
                        axis=-1)

    def pdf(d):
        return np.maximum(d[:, 2], 0.0) / np.pi

    t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_count=200_000,
                      res=15)
    assert t.run(), t.messages


def test_uniform_sphere_chi2():
    def sample(n):
        s = _rng(n, 2, seed=1)
        v = warp.uniform_sphere_c(jnp.asarray(s[:, 0]), jnp.asarray(s[:, 1]))
        return np.stack([np.asarray(v.x), np.asarray(v.y), np.asarray(v.z)],
                        axis=-1)

    def pdf(d):
        return np.full(d.shape[0], 1.0 / (4.0 * np.pi))

    t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_count=200_000,
                      res=15)
    assert t.run(), t.messages


def test_rayleigh_phase_chi2():
    """Rayleigh Cardano inverse-CDF sampling matches its pdf
    (reference src/phase/rayleigh.cpp)."""
    from mitsuba3dopplertof_tpu.media import rayleigh_sample, rayleigh_eval
    wi = Vec3(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(-1.0))

    def sample(n):
        s = _rng(n, 2, seed=3)
        wiN = Vec3(jnp.full(n, wi.x), jnp.full(n, wi.y), jnp.full(n, wi.z))
        wo, _ = rayleigh_sample(wiN, jnp.asarray(s[:, 0]),
                                jnp.asarray(s[:, 1]))
        return np.stack([np.asarray(wo.x), np.asarray(wo.y),
                         np.asarray(wo.z)], axis=-1)

    def pdf(d):
        return np.asarray(rayleigh_eval(jnp.asarray(d[:, 2])))

    t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_count=200_000,
                      res=15)
    assert t.run(), t.messages


def test_tabphase_chi2():
    """Tabulated-phase trapezoid-CDF inversion matches its piecewise-linear
    pdf (reference src/phase/tabphase.cpp + ContinuousDistribution)."""
    from mitsuba3dopplertof_tpu.media import (tab_phase_tables, tab_sample,
                                              tab_eval)
    vals = np.array([0.1, 0.4, 1.2, 0.2, 0.9, 2.0, 0.05])
    grid, v, cdf, inv_n = tab_phase_tables(vals)
    wi = Vec3(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(-1.0))

    def sample(n):
        s = _rng(n, 2, seed=4)
        wiN = Vec3(jnp.full(n, wi.x), jnp.full(n, wi.y), jnp.full(n, wi.z))
        wo, _ = tab_sample(wiN, jnp.asarray(s[:, 0]), jnp.asarray(s[:, 1]),
                           grid, v, cdf, inv_n)
        return np.stack([np.asarray(wo.x), np.asarray(wo.y),
                         np.asarray(wo.z)], axis=-1)

    def pdf(d):
        # propagation dir = -wi = +z; cos_forward = d.z
        return np.asarray(tab_eval(jnp.asarray(d[:, 2]), grid, v, inv_n))

    t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_count=200_000,
                      res=15)
    assert t.run(), t.messages


def test_ggx_vndf_chi2():
    """GGX visible-normal sampling matches its pdf (reference
    microfacet chi2 tests)."""
    from mitsuba3dopplertof_tpu.core import microfacet as mf
    wi = Vec3(jnp.float32(0.3), jnp.float32(0.2),
              jnp.float32(np.sqrt(1 - 0.09 - 0.04)))
    alpha = 0.3

    def sample(n):
        s = _rng(n, 2, seed=2)
        wiN = Vec3(jnp.full(n, wi.x), jnp.full(n, wi.y), jnp.full(n, wi.z))
        m, _ = mf.ggx_sample_vndf(wiN, jnp.float32(alpha), jnp.float32(alpha),
                                  jnp.asarray(s[:, 0]), jnp.asarray(s[:, 1]))
        return np.stack([np.asarray(m.x), np.asarray(m.y), np.asarray(m.z)],
                        axis=-1)

    def pdf(d):
        n = d.shape[0]
        m = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                 jnp.asarray(d[:, 2]))
        wiN = Vec3(jnp.full(n, wi.x), jnp.full(n, wi.y), jnp.full(n, wi.z))
        return np.asarray(mf.ggx_pdf_visible(wiN, m, jnp.float32(alpha),
                                             jnp.float32(alpha)))

    t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_count=200_000,
                      res=15)
    assert t.run(), t.messages


def test_diffuse_bsdf_sampling_chi2():
    """diffuse sample() distribution matches its pdf via the dispatch path."""
    import mitsuba3dopplertof_tpu as mi
    from mitsuba3dopplertof_tpu.bsdfs import eval_pdf_sample

    scene = mi.load_string("""
    <scene version="3.0.0">
      <sensor type="perspective"><float name="fov" value="45"/></sensor>
      <shape type="rectangle"><bsdf type="diffuse"/></shape>
    </scene>""")
    sa = scene.compile()

    def sample(n):
        s = _rng(n, 3, seed=3)
        wi = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
        lane_bsdf = jnp.zeros(n, jnp.int32)
        r = eval_pdf_sample(sa, lane_bsdf, wi, wi, jnp.asarray(s[:, 0]),
                            jnp.asarray(s[:, 1]), jnp.asarray(s[:, 2]))
        return np.stack([np.asarray(r.wo.x), np.asarray(r.wo.y),
                         np.asarray(r.wo.z)], axis=-1)

    def pdf(d):
        return np.maximum(d[:, 2], 0.0) / np.pi

    t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_count=100_000,
                      res=15)
    assert t.run(), t.messages


def test_hg_phase_chi2():
    """Henyey-Greenstein inverse-CDF sampling matches its pdf
    (reference src/phase/hg.cpp chi2)."""
    from mitsuba3dopplertof_tpu.media import hg_sample, hg_eval
    g = 0.6
    wi = Vec3(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(-1.0))

    def sample(n):
        s = _rng(n, 2, seed=9)
        wiN = Vec3(jnp.full(n, wi.x), jnp.full(n, wi.y), jnp.full(n, wi.z))
        wo, _ = hg_sample(wiN, jnp.float32(g), jnp.asarray(s[:, 0]),
                          jnp.asarray(s[:, 1]))
        return np.stack([np.asarray(wo.x), np.asarray(wo.y),
                         np.asarray(wo.z)], axis=-1)

    def pdf(d):
        # propagation dir = -wi = +z; cos_forward = d.z
        return np.asarray(hg_eval(jnp.asarray(d[:, 2]), jnp.float32(g)))

    t = ChiSquareTest(SphericalDomain(), sample, pdf, sample_count=200_000,
                      res=15)
    assert t.run(), t.messages


def test_math_rlgamma():
    """mi.math.rlgamma (reference src/python/python/math.py): P(1,x) =
    1 - exp(-x); P(a,0) = 0; chi2 p-value consistency with the suite's
    own survival function."""
    import math
    import mitsuba3dopplertof_tpu as mi
    from mitsuba3dopplertof_tpu.utils.chi2 import _chi2_sf
    for x in (0.05, 1.0, 4.5):
        assert abs(mi.math.rlgamma(1.0, x) - (1.0 - math.exp(-x))) < 1e-10
    assert mi.math.rlgamma(2.0, 0.0) == 0.0
    # sf(x; k) == 1 - P(k/2, x/2)
    for k, x in ((3, 2.0), (10, 11.5)):
        assert abs((1.0 - mi.math.rlgamma(0.5 * k, 0.5 * x))
                   - _chi2_sf(x, k)) < 1e-12
