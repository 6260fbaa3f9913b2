"""Principled / principledthin full-lobe coverage (reference
src/bsdfs/principled.cpp + principledthin.cpp + principledhelpers.h):
chi2 GOF per lobe configuration, weight==eval/pdf consistency, and
behavioral checks that each formerly parsed-and-ignored parameter now
changes the response."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.bsdfs import eval_pdf_sample
from mitsuba3dopplertof_tpu.core.vec import Vec3

from test_chi2_bsdfs import _scene_with, _chi2_bsdf, _rng, WI


# ---------------------------------------------------------------------------
# chi2 GOF per lobe configuration (reference test strategy: chi2 over the
# full sample()/pdf() mixture at several parameter points)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,xml,seed", [
    ("anisotropic", """<bsdf type="principled">
        <float name="roughness" value="0.4"/>
        <float name="anisotropic" value="0.8"/>
        <float name="metallic" value="0.6"/></bsdf>""", 31),
    ("clearcoat", """<bsdf type="principled">
        <float name="roughness" value="0.5"/>
        <float name="clearcoat" value="1.0"/>
        <float name="clearcoat_gloss" value="0.7"/></bsdf>""", 32),
    ("sheen_flatness", """<bsdf type="principled">
        <float name="roughness" value="0.6"/>
        <float name="sheen" value="1.0"/>
        <float name="sheen_tint" value="0.5"/>
        <float name="flatness" value="0.7"/>
        <float name="spec_tint" value="0.6"/></bsdf>""", 33),
    ("spec_trans", """<bsdf type="principled">
        <float name="roughness" value="0.5"/>
        <float name="spec_trans" value="0.7"/>
        <float name="eta" value="1.5"/></bsdf>""", 34),
    ("kitchen_sink", """<bsdf type="principled">
        <rgb name="base_color" value="0.8,0.3,0.3"/>
        <float name="roughness" value="0.4"/>
        <float name="anisotropic" value="0.5"/>
        <float name="metallic" value="0.3"/>
        <float name="spec_tint" value="0.4"/>
        <float name="sheen" value="0.3"/>
        <float name="sheen_tint" value="0.2"/>
        <float name="clearcoat" value="0.6"/>
        <float name="clearcoat_gloss" value="0.3"/>
        <float name="spec_trans" value="0.4"/>
        <float name="specular" value="0.6"/></bsdf>""", 35),
    # reference test02_chi2_spec_trans_outside (principled_test strategy):
    # regression for the zero-weight-sample histogram protocol — before the
    # BSDFAdapter-faithful rejection this failed at p=0.0000
    ("ref_test02_outside", """<bsdf type="principled">
        <float name="roughness" value="0.6"/>
        <float name="metallic" value="0.2"/>
        <float name="anisotropic" value="0.4"/>
        <float name="clearcoat" value="0.8"/>
        <float name="spec_trans" value="0.7"/>
        <float name="eta" value="1.3296"/></bsdf>""", 61),
])
def test_principled_lobe_chi2(name, xml, seed):
    t = _chi2_bsdf(_scene_with(xml), WI, seed=seed)
    assert t.run(), (name, t.messages)


def test_principled_backside_transmission_chi2():
    """Inside-the-object incidence only samples reflection/transmission
    through the main specular distribution (principled.cpp:372-374)."""
    sa = _scene_with("""<bsdf type="principled">
        <float name="roughness" value="0.5"/>
        <float name="spec_trans" value="0.8"/>
        <float name="eta" value="1.5"/></bsdf>""")
    t = _chi2_bsdf(sa, (0.3, 0.2, -WI[2]), seed=36)
    assert t.run(), t.messages


@pytest.mark.parametrize("name,xml,seed", [
    ("thin_trans", """<bsdf type="principledthin">
        <float name="roughness" value="0.5"/>
        <float name="spec_trans" value="0.6"/>
        <float name="eta" value="1.4"/></bsdf>""", 41),
    ("thin_diff_trans", """<bsdf type="principledthin">
        <float name="roughness" value="0.6"/>
        <float name="diff_trans" value="1.2"/>
        <float name="sheen" value="0.5"/>
        <float name="flatness" value="0.4"/></bsdf>""", 42),
    ("thin_aniso", """<bsdf type="principledthin">
        <float name="roughness" value="0.4"/>
        <float name="anisotropic" value="0.7"/>
        <float name="spec_trans" value="0.5"/>
        <float name="spec_tint" value="0.5"/></bsdf>""", 43),
])
def test_principledthin_lobe_chi2(name, xml, seed):
    t = _chi2_bsdf(_scene_with(xml), WI, seed=seed)
    assert t.run(), (name, t.messages)


def test_principledthin_symmetric():
    """The thin sheet is symmetric: sampling from below mirrors sampling
    from above (principledthin.cpp:289 'Thin BSDF is symmetric')."""
    sa = _scene_with("""<bsdf type="principledthin">
        <float name="roughness" value="0.5"/>
        <float name="spec_trans" value="0.6"/>
        <float name="diff_trans" value="0.8"/></bsdf>""")
    t = _chi2_bsdf(sa, (0.3, 0.2, -WI[2]), seed=44)
    assert t.run(), t.messages


# ---------------------------------------------------------------------------
# weight == eval/pdf consistency through the sampling branch
# ---------------------------------------------------------------------------

def _consistency(xml, side=1.0, seed=51):
    sa = _scene_with(xml)
    n = 50_000
    wi = Vec3(jnp.full(n, jnp.float32(0.3)), jnp.full(n, jnp.float32(0.2)),
              jnp.full(n, jnp.float32(side * WI[2])))
    s = _rng(n, 3, seed=seed)
    lane = jnp.zeros(n, jnp.int32)
    r = eval_pdf_sample(sa, lane, wi, wi, jnp.asarray(s[:, 0]),
                        jnp.asarray(s[:, 1]), jnp.asarray(s[:, 2]))
    # re-evaluate the sampled direction through the NEE branch
    r2 = eval_pdf_sample(sa, lane, wi, r.wo, jnp.asarray(s[:, 0]),
                         jnp.asarray(s[:, 1]), jnp.asarray(s[:, 2]))
    # weight-zeroed lanes (macro/micro-incompatible samples keep their pdf
    # but lose their weight, as in the reference) are excluded
    ok = (np.asarray(r.pdf) > 1e-6) & (np.asarray(r.weight.x) > 0)
    w = np.asarray(r.weight.x)[ok]
    ref = (np.asarray(r2.val_nee.x) / np.maximum(np.asarray(r2.pdf_nee),
                                                 1e-12))[ok]
    assert np.allclose(w, ref, rtol=2e-3, atol=2e-4), \
        float(np.abs(w - ref).max())
    # pdf consistency: the sampling pdf equals the queried pdf pointwise
    assert np.allclose(np.asarray(r.pdf)[ok], np.asarray(r2.pdf_nee)[ok],
                       rtol=2e-3, atol=1e-6)


def test_principled_weight_eval_pdf_consistency():
    _consistency("""<bsdf type="principled">
        <rgb name="base_color" value="0.7,0.5,0.3"/>
        <float name="roughness" value="0.4"/>
        <float name="anisotropic" value="0.5"/>
        <float name="metallic" value="0.3"/>
        <float name="clearcoat" value="0.8"/>
        <float name="spec_trans" value="0.5"/>
        <float name="sheen" value="0.4"/></bsdf>""")


def test_principled_backside_consistency():
    _consistency("""<bsdf type="principled">
        <float name="roughness" value="0.5"/>
        <float name="spec_trans" value="0.8"/>
        <float name="eta" value="1.5"/></bsdf>""", side=-1.0, seed=52)


def test_principledthin_consistency():
    _consistency("""<bsdf type="principledthin">
        <float name="roughness" value="0.5"/>
        <float name="spec_trans" value="0.6"/>
        <float name="diff_trans" value="0.7"/>
        <float name="sheen" value="0.5"/></bsdf>""", seed=53)


# ---------------------------------------------------------------------------
# every parameter changes the response (no parsed-and-ignored knobs)
# ---------------------------------------------------------------------------

def _eval_field(xml, side=1.0):
    sa = _scene_with(xml)
    n = 4096
    wi = Vec3(jnp.full(n, jnp.float32(0.3)), jnp.full(n, jnp.float32(0.2)),
              jnp.full(n, jnp.float32(side * WI[2])))
    s = _rng(n, 3, seed=7)
    # spread of outgoing directions on both hemispheres
    th = np.arccos(1.0 - 2.0 * s[:, 0])
    ph = 2 * np.pi * s[:, 1]
    wo = Vec3(jnp.asarray(np.sin(th) * np.cos(ph)),
              jnp.asarray(np.sin(th) * np.sin(ph)),
              jnp.asarray(np.cos(th)))
    lane = jnp.zeros(n, jnp.int32)
    z = jnp.full(n, 0.5, jnp.float32)
    r = eval_pdf_sample(sa, lane, wi, wo, z, z, z)
    return np.asarray(r.val_nee.x + r.val_nee.y + r.val_nee.z)


BASE = """<bsdf type="principled">
    <float name="roughness" value="0.4"/>{}</bsdf>"""


@pytest.mark.parametrize("knob", [
    '<float name="anisotropic" value="0.9"/>',
    '<float name="sheen" value="1.0"/>',
    '<float name="clearcoat" value="1.0"/>',
    '<float name="spec_trans" value="0.9"/>',
    '<float name="flatness" value="1.0"/>',
    '<float name="metallic" value="0.9"/>',
    '<float name="spec_tint" value="1.0"/>'
    '<rgb name="base_color" value="0.8,0.2,0.2"/>',
])
def test_principled_knob_has_effect(knob):
    a = _eval_field(BASE.format(knob))
    b = _eval_field(BASE.format(""))
    assert np.abs(a - b).max() > 1e-3 * max(np.abs(b).max(), 1e-6)


def test_principledthin_diff_trans_has_effect():
    thin = """<bsdf type="principledthin">
        <float name="roughness" value="0.4"/>{}</bsdf>"""
    a = _eval_field(thin.format('<float name="diff_trans" value="1.5"/>'))
    b = _eval_field(thin.format(""))
    assert np.abs(a - b).max() > 1e-3 * max(np.abs(b).max(), 1e-6)


def test_principled_eta_specular_exclusive():
    with pytest.raises(Exception):
        _scene_with("""<bsdf type="principled">
            <float name="eta" value="1.5"/>
            <float name="specular" value="0.5"/></bsdf>""")
