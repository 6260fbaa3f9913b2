"""Chi-square GOF for the rough mixture BSDFs through the dispatch path —
sample() histograms vs the same plugin's pdf evaluation (the reference's
per-plugin chi2 suite, src/bsdfs/tests/*: test_chi2_*). Delta-carrying
plugins (plastic, dielectric) are excluded exactly as the reference
excludes delta lobes from chi2 (chi2.py BSDFAdapter)."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.bsdfs import eval_pdf_sample
from mitsuba3dopplertof_tpu.core.vec import Vec3
from mitsuba3dopplertof_tpu.utils.chi2 import ChiSquareTest, SphericalDomain


def _rng(n, d, seed=0):
    return np.random.RandomState(seed).rand(n, d).astype(np.float32)


def _scene_with(bsdf_xml: str):
    scene = mi.load_string(f"""
    <scene version="3.0.0">
      <sensor type="perspective"><float name="fov" value="45"/></sensor>
      <shape type="rectangle">{bsdf_xml}</shape>
    </scene>""")
    return scene.compile()


def _chi2_bsdf(sa, wi_tuple, seed, sample_count=200_000, res=15):
    wix, wiy, wiz = wi_tuple

    def wiN(n):
        return Vec3(jnp.full(n, jnp.float32(wix)),
                    jnp.full(n, jnp.float32(wiy)),
                    jnp.full(n, jnp.float32(wiz)))

    def sample(n):
        s = _rng(n, 3, seed=seed)
        lane = jnp.zeros(n, jnp.int32)
        r = eval_pdf_sample(sa, lane, wiN(n), wiN(n),
                            jnp.asarray(s[:, 0]), jnp.asarray(s[:, 1]),
                            jnp.asarray(s[:, 2]))
        out = np.stack([np.asarray(r.wo.x), np.asarray(r.wo.y),
                        np.asarray(r.wo.z)], axis=-1)
        # REJECTED samples (pdf 0) are dropped from the histogram — the
        # reference BSDFAdapter zero-weights rejections and drops every
        # zero-weight sample (chi2.py:506-514). Samplers here mark the
        # same rejections by zeroing bs.pdf (a rejected sample's landing
        # density does NOT match pdf(), so keeping it breaks the GOF for
        # wide-roughness mixtures). Zero-WEIGHT samples with pdf > 0
        # (e.g. G2-shadowed but countable) stay: their density is pdf,
        # and dropping them loses real mass (roughdielectric alpha=0.3
        # fails at stat>4000 under a blanket weight==0 drop).
        out[np.asarray(r.pdf) <= 0.0] = np.nan
        return out

    def pdf(d):
        n = d.shape[0]
        lane = jnp.zeros(n, jnp.int32)
        wo = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                  jnp.asarray(d[:, 2]))
        z = jnp.full(n, 0.5, jnp.float32)
        r = eval_pdf_sample(sa, lane, wiN(n), wo, z, z, z)
        return np.asarray(r.pdf_nee)

    # ires=16: the midpoint pdf quadrature at ires=8 under-integrates the
    # steep transmission-horizon band of wide rough mixtures (principled
    # spec_trans measured a persistent +25 chi2 excess across seeds that
    # vanishes at ires=16 — quadrature error, not sampling bias)
    return ChiSquareTest(SphericalDomain(), sample, pdf,
                         sample_count=sample_count, res=res, ires=16)


WI = (0.3, 0.2, float(np.sqrt(1.0 - 0.09 - 0.04)))


def test_roughconductor_chi2():
    sa = _scene_with("""<bsdf type="roughconductor">
        <float name="alpha" value="0.3"/></bsdf>""")
    t = _chi2_bsdf(sa, WI, seed=11)
    assert t.run(), t.messages


def test_roughplastic_chi2():
    """Diffuse + GGX specular mixture with sampling weights matching the
    plugin's own lobe-selection probabilities."""
    sa = _scene_with("""<bsdf type="roughplastic">
        <float name="alpha" value="0.3"/></bsdf>""")
    t = _chi2_bsdf(sa, WI, seed=12)
    assert t.run(), t.messages


def test_roughdielectric_chi2():
    """Reflection + refraction over the full sphere: checks the
    transmission half-vector Jacobian, not just the reflect lobe."""
    sa = _scene_with("""<bsdf type="roughdielectric">
        <float name="alpha" value="0.3"/>
        <float name="int_ior" value="1.5"/></bsdf>""")
    t = _chi2_bsdf(sa, WI, seed=13)
    assert t.run(), t.messages


def test_roughdielectric_chi2_from_inside():
    """Incidence from the dense side (wi.z < 0) exercises the eta-flip
    branch and total internal reflection."""
    sa = _scene_with("""<bsdf type="roughdielectric">
        <float name="alpha" value="0.35"/>
        <float name="int_ior" value="1.5"/></bsdf>""")
    t = _chi2_bsdf(sa, (0.3, 0.2, -WI[2]), seed=14)
    assert t.run(), t.messages


def test_pplastic_chi2():
    sa = _scene_with("""<bsdf type="pplastic">
        <float name="alpha" value="0.3"/></bsdf>""")
    t = _chi2_bsdf(sa, WI, seed=15)
    assert t.run(), t.messages


def test_principled_chi2():
    sa = _scene_with("""<bsdf type="principled">
        <float name="roughness" value="0.5"/>
        <float name="metallic" value="0.4"/>
        <float name="specular" value="0.5"/></bsdf>""")
    t = _chi2_bsdf(sa, WI, seed=16)
    assert t.run(), t.messages


def test_roughdielectric_sample_eval_consistency():
    """VNDF identity: the sampled-lobe weight (G2/G1 * color * compression)
    must equal eval(wo_sampled)/pdf(wo_sampled) — ties the sampling branch
    to the NEE eval/pdf branch, both lobes, both incidence sides."""
    sa = _scene_with("""<bsdf type="roughdielectric">
        <float name="alpha" value="0.3"/>
        <float name="int_ior" value="1.5"/></bsdf>""")
    for side, seed in ((1.0, 21), (-1.0, 22)):
        n = 50_000
        wi = (0.3, 0.2, side * WI[2])
        wiN = Vec3(jnp.full(n, jnp.float32(wi[0])),
                   jnp.full(n, jnp.float32(wi[1])),
                   jnp.full(n, jnp.float32(wi[2])))
        s = _rng(n, 3, seed=seed)
        lane = jnp.zeros(n, jnp.int32)
        r = eval_pdf_sample(sa, lane, wiN, wiN, jnp.asarray(s[:, 0]),
                            jnp.asarray(s[:, 1]), jnp.asarray(s[:, 2]))
        half = jnp.full(n, 0.5, jnp.float32)
        r2 = eval_pdf_sample(sa, lane, wiN, r.wo, half, half, half)
        pdf = np.asarray(r.pdf)
        ok = pdf > 1e-6
        ratio = np.asarray(r2.val_nee.x)[ok] / pdf[ok]
        wgt = np.asarray(r.weight.x)[ok]
        err = np.abs(ratio - wgt) / np.maximum(wgt, 1e-3)
        assert np.quantile(err, 0.99) < 1e-2, (side, np.quantile(err, 0.99))


def test_roughdielectric_no_spurious_zero_weights():
    """Regression: the sampled-weight G2 and the transmission eval G both
    z-flipped the refracted wo, which broke smith_g1's dot(v,m)*v.z sign
    rule for ~3% of transmission samples — weight (and eval) forced to 0,
    a correlated energy loss the eval/pdf consistency test could NOT see
    (both sides of the identity were zeroed). An accepted sample
    (pdf > 0) must carry nonzero weight: G2 is continuous and vanishes
    only on a measure-zero set."""
    sa = _scene_with("""<bsdf type="roughdielectric">
        <float name="alpha" value="0.3"/>
        <float name="int_ior" value="1.5"/></bsdf>""")
    n = 100_000
    wiN = Vec3(jnp.full(n, jnp.float32(WI[0])),
               jnp.full(n, jnp.float32(WI[1])),
               jnp.full(n, jnp.float32(WI[2])))
    s = _rng(n, 3, seed=99)
    lane = jnp.zeros(n, jnp.int32)
    r = eval_pdf_sample(sa, lane, wiN, wiN, jnp.asarray(s[:, 0]),
                        jnp.asarray(s[:, 1]), jnp.asarray(s[:, 2]))
    w = np.asarray(r.weight.x)
    pdf = np.asarray(r.pdf)
    frac_zero = ((w == 0.0) & (pdf > 0.0)).mean()
    assert frac_zero < 1e-4, frac_zero


def test_roughconductor_beckmann_chi2():
    """Beckmann distribution (classic D*cos sampling, reference
    sample_visible=false): sampled micro-normals' reflected directions
    match the plugin's own pdf."""
    sa = _scene_with("""<bsdf type="roughconductor">
        <string name="distribution" value="beckmann"/>
        <float name="alpha" value="0.3"/></bsdf>""")
    t = _chi2_bsdf(sa, WI, seed=14)
    assert t.run(), t.messages


def test_roughconductor_beckmann_anisotropic_chi2():
    sa = _scene_with("""<bsdf type="roughconductor">
        <string name="distribution" value="beckmann"/>
        <float name="alpha_u" value="0.15"/>
        <float name="alpha_v" value="0.4"/></bsdf>""")
    t = _chi2_bsdf(sa, WI, seed=15)
    assert t.run(), t.messages


def test_beckmann_differs_from_ggx_but_agrees_in_mean():
    """distribution="beckmann" actually engages (different lobe shape)
    while NEE and BSDF-sampling strategies stay consistent (the direct
    integrator's split invariance)."""
    from mitsuba3dopplertof_tpu.core import transform as tf

    def render(dist, integ):
        d = {"type": "scene", "integrator": integ,
             "sensor": {"type": "perspective", "fov": 45,
                        "to_world": tf.look_at([0, 1, -3], [0, 0.3, 0],
                                               [0, 1, 0]),
                        "film": {"type": "hdrfilm", "width": 12,
                                 "height": 12, "rfilter": {"type": "box"}},
                        "sampler": {"type": "independent",
                                    "sample_count": 256}},
             "floor": {"type": "rectangle",
                       "to_world": tf.rotate([1, 0, 0], -90)
                       @ tf.scale([3, 3, 1]),
                       "bsdf": {"type": "roughconductor", "alpha": 0.25,
                                "distribution": dist}},
             "light": {"type": "sphere", "radius": 0.4,
                       "to_world": tf.translate([1.5, 2, 0]),
                       "emitter": {"type": "area",
                                   "radiance": {"type": "rgb",
                                                "value": 10.0}}}}
        return np.asarray(mi.render(mi.load_dict(d), spp=256, seed=0))

    nee = {"type": "direct", "emitter_samples": 2, "bsdf_samples": 0}
    bsf = {"type": "direct", "emitter_samples": 0, "bsdf_samples": 2}
    b_nee = render("beckmann", nee)
    b_bsf = render("beckmann", bsf)
    g_nee = render("ggx", nee)
    assert abs(b_bsf.sum() / b_nee.sum() - 1.0) < 0.1, \
        (b_nee.sum(), b_bsf.sum())
    # lobe shapes differ: per-pixel images are NOT close
    assert np.abs(b_nee - g_nee).max() > 0.02 * g_nee.max()
