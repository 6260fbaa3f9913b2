"""Principled / principledthin lobe math (reference src/bsdfs/principled.cpp
902 LoC + principledhelpers.h 332 LoC + principledthin.cpp; Burley 2012/2015).

Both BSDFs are evaluated as fused eval+pdf+sample dispatch functions over
the SoA parameter table (masked type dispatch, no vcalls): diffuse +
retro-reflection + fake subsurface (flatness) + sheen (tinted), anisotropic
GGX main specular with the metallic/spec_tint Schlick-blended Fresnel
(principled_fresnel, principledhelpers.h:240-275), GTR1 clearcoat
(principledhelpers.h:22-60), and rough dielectric transmission (spec_trans).
The thin variant replaces refraction by reflect-and-flip with the
Burley-2015 scaled roughness (principledthin.cpp:360-380) and adds diffuse
transmission (diff_trans).

Sampling mirrors the reference exactly: lobe selection thresholds over
[diffuse | clearcoat | spec_trans | spec_reflect] with Fresnel measured at
the *sampled* microfacet normal, while pdf() re-derives the mixture at the
half-vector of the given wo (principled.cpp:374-417 vs :760-840) — the
returned weight is eval(wo)/pdf(wo), so the estimator stays unbiased
regardless of the selection-vs-pdf mismatch, as in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vec import Vec3, dot, normalize, where3
from ..core import microfacet as mf
from ..core import warp
from ..core.math import PI, INV_PI
from ..core.fresnel import fresnel_dielectric


def _luminance(c: Vec3):
    return 0.212671 * c.x + 0.715160 * c.y + 0.072169 * c.z


def _schlick_weight(cos_i):
    m = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    return (m * m) * (m * m) * m


def _calc_schlick1(r0, cos_theta_i, eta):
    """Scalar Schlick with the transmitted-angle correction for eta<1
    (principledhelpers.h calc_schlick)."""
    outside = cos_theta_i >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = jnp.where(outside, 1.0 / eta, eta)
    ctt_sqr = 1.0 - (1.0 - cos_theta_i * cos_theta_i) * eta_ti * eta_ti
    cos_theta_t = jnp.sqrt(jnp.maximum(ctt_sqr, 0.0))
    w = jnp.where(eta_it > 1.0, _schlick_weight(jnp.abs(cos_theta_i)),
                  _schlick_weight(cos_theta_t))
    return r0 + (1.0 - r0) * w


def _calc_schlick3(r0: Vec3, cos_theta_i, eta) -> Vec3:
    outside = cos_theta_i >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = jnp.where(outside, 1.0 / eta, eta)
    ctt_sqr = 1.0 - (1.0 - cos_theta_i * cos_theta_i) * eta_ti * eta_ti
    cos_theta_t = jnp.sqrt(jnp.maximum(ctt_sqr, 0.0))
    w = jnp.where(eta_it > 1.0, _schlick_weight(jnp.abs(cos_theta_i)),
                  _schlick_weight(cos_theta_t))
    return Vec3(r0.x + (1.0 - r0.x) * w, r0.y + (1.0 - r0.y) * w,
                r0.z + (1.0 - r0.z) * w)


def _schlick_r0_eta(eta):
    return ((eta - 1.0) / (eta + 1.0)) ** 2


def _mac_mic(m: Vec3, wi: Vec3, wo: Vec3, cos_i, reflection: bool):
    """Macro/micro surface compatibility (principledhelpers.h:199-212)."""
    s = jnp.sign(cos_i)
    a = (wi.x * m.x + wi.y * m.y + wi.z * m.z) * s > 0.0
    if reflection:
        b = (wo.x * m.x + wo.y * m.y + wo.z * m.z) * s > 0.0
    else:
        b = (wo.x * m.x + wo.y * m.y + wo.z * m.z) * (-s) > 0.0
    return a & b


def _gtr1_eval(m_z, alpha):
    a2 = alpha * alpha
    res = (a2 - 1.0) / (PI * jnp.log(a2) * (1.0 + (a2 - 1.0) * m_z * m_z))
    return jnp.where(res * m_z > 1e-20, res, 0.0)


def _gtr1_pdf(m_z, alpha):
    return jnp.where(m_z < 0.0, 0.0, m_z * _gtr1_eval(m_z, alpha))


def _gtr1_sample(alpha, s1, s2):
    phi = 2.0 * PI * s1
    a2 = alpha * alpha
    ct2 = (1.0 - jnp.power(a2, 1.0 - s2)) / (1.0 - a2)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct2))
    ct = jnp.sqrt(jnp.maximum(0.0, ct2))
    return Vec3(jnp.cos(phi) * st, jnp.sin(phi) * st, ct)


def _smith_ggx1(v: Vec3, wh: Vec3, alpha):
    """Separable GGX masking for the clearcoat lobe
    (principledhelpers.h:85-113)."""
    a2 = alpha * alpha
    ct = jnp.abs(v.z)
    ct2 = ct * ct
    tan2 = (1.0 - ct2) / jnp.maximum(ct2, 1e-20)
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * tan2))
    g = jnp.where(v.z == 1.0, 1.0, g)
    g = jnp.where(dot(v, wh) * v.z <= 0.0, 0.0, g)
    return g


def _reflect(w: Vec3, m: Vec3) -> Vec3:
    k = 2.0 * dot(w, m)
    return Vec3(k * m.x - w.x, k * m.y - w.y, k * m.z - w.z)


def _refract(w: Vec3, m: Vec3, cos_theta_t, eta_ti) -> Vec3:
    k = dot(w, m) * eta_ti + cos_theta_t
    return Vec3(k * m.x - eta_ti * w.x, k * m.y - eta_ti * w.y,
                k * m.z - eta_ti * w.z)


def _mulsign(v: Vec3, s) -> Vec3:
    sg = jnp.sign(jnp.where(s == 0.0, 1.0, s))
    return Vec3(v.x * sg, v.y * sg, v.z * sg)


# ---------------------------------------------------------------------------
# principled
# ---------------------------------------------------------------------------

def principled_eval_pdf_sample(P, param, wi: Vec3, wo_nee: Vec3, s1, s2x,
                               s2y, tex_refl=None, tex_mask=None):
    """Full principled BSDF. ``P`` is the slot-constant namespace (the
    bsdfs package) to avoid a circular import."""
    from . import BSDFSampleResult

    base = Vec3(param(P.P_REFL), param(P.P_REFL + 1), param(P.P_REFL + 2))
    if tex_refl is not None:
        base = where3(tex_mask, tex_refl, base)
    two_sided = param(P.P_TWOSIDED) > 0.5
    sgn = jnp.where(two_sided & (wi.z < 0.0), -1.0, 1.0)
    wi_l = Vec3(wi.x, wi.y, wi.z * sgn)
    cos_i = wi_l.z

    eta = param(P.P_ETA)
    eta = jnp.where(eta <= 0.0, 1.5, eta)     # non-principled rows guard
    ax = jnp.maximum(param(P.P_PR_AX), 1e-4)
    ay = jnp.maximum(param(P.P_PR_AY), 1e-4)
    metallic = param(P.P_METALLIC)
    spec_tint = param(P.P_SPECTUNE)
    sheen = param(P.P_PR_SHEEN)
    sheen_tint = param(P.P_PR_SHEENTINT)
    flatness = param(P.P_PR_FLAT)
    clearcoat = param(P.P_PR_CC)
    cc_gloss = param(P.P_PR_CCGLOSS)
    strans = param(P.P_PR_STRANS)
    dsrate = param(P.P_PR_DSRATE)
    ssrate = param(P.P_PR_SSRATE)
    csrate = param(P.P_PR_CSRATE)
    rough = param(P.P_PR_ROUGH)

    brdf_w = (1.0 - metallic) * (1.0 - strans)
    bsdf_w = (1.0 - metallic) * strans
    front = cos_i > 0.0
    active0 = (cos_i != 0.0) & (front | (bsdf_w > 0.0))
    alpha_cc = 0.1 + (0.001 - 0.1) * cc_gloss
    inv_eta = 1.0 / eta
    eta_path = jnp.where(front, eta, inv_eta)
    inv_eta_path = jnp.where(front, inv_eta, eta)
    lum = _luminance(base)

    def mixture_pdf(wo: Vec3):
        """reference pdf() (principled.cpp:713-840)."""
        cos_o = wo.z
        reflect = cos_i * cos_o > 0.0
        refract = cos_i * cos_o < 0.0
        wh = normalize(Vec3(wi_l.x + wo.x * jnp.where(reflect, 1.0, eta_path),
                            wi_l.y + wo.y * jnp.where(reflect, 1.0, eta_path),
                            wi_l.z + wo.z * jnp.where(reflect, 1.0, eta_path)))
        wh = _mulsign(wh, wh.z)
        F_sd, _, _, _ = fresnel_dielectric(dot(wi_l, wh), eta)
        p_sr = jnp.where(front, ssrate * (1.0 - bsdf_w * (1.0 - F_sd)), F_sd)
        p_st = jnp.where(front, ssrate * bsdf_w * (1.0 - F_sd), 1.0 - F_sd)
        p_st = jnp.where(strans > 0.0, p_st, 0.0)
        p_cc = jnp.where(front, 0.25 * clearcoat * csrate, 0.0)
        p_d = jnp.where(front, brdf_w * dsrate, 0.0)
        rcp = 1.0 / jnp.maximum(p_sr + p_st + p_cc + p_d, 1e-12)

        dot_wi_h = dot(wi_l, wh)
        dot_wo_h = dot(wo, wh)
        dwh_dwo = jnp.abs(jnp.where(
            reflect, 1.0 / jnp.where(dot_wo_h == 0.0, 1e12, 4.0 * dot_wo_h),
            (eta_path * eta_path * dot_wo_h)
            / jnp.maximum((dot_wi_h + eta_path * dot_wo_h) ** 2, 1e-12)))

        wi_f = _mulsign(wi_l, cos_i)
        pdf_m = mf.ggx_pdf_visible(wi_f, wh, ax, ay)
        mm_r = _mac_mic(wh, wi_l, wo, cos_i, True) & reflect
        mm_t = _mac_mic(wh, wi_l, wo, cos_i, False) & refract

        pdf = jnp.where(mm_r, p_sr * rcp * pdf_m * dwh_dwo, 0.0)
        pdf += jnp.where(reflect, p_d * rcp * INV_PI
                         * jnp.maximum(cos_o * jnp.sign(cos_i), 0.0), 0.0)
        pdf += jnp.where(mm_t, p_st * rcp * pdf_m * dwh_dwo, 0.0)
        pdf += jnp.where(mm_r, p_cc * rcp * _gtr1_pdf(wh.z, alpha_cc)
                         * dwh_dwo, 0.0)
        return jnp.where(active0, pdf, 0.0)

    def eval_f(wo: Vec3) -> Vec3:
        """reference eval() (principled.cpp:494-712), returns f*cos."""
        cos_o = wo.z
        reflect = cos_i * cos_o > 0.0
        refract = cos_i * cos_o < 0.0
        wh = normalize(Vec3(wi_l.x + wo.x * jnp.where(reflect, 1.0, eta_path),
                            wi_l.y + wo.y * jnp.where(reflect, 1.0, eta_path),
                            wi_l.z + wo.z * jnp.where(reflect, 1.0, eta_path)))
        wh = _mulsign(wh, wh.z)
        F_sd, _, _, _ = fresnel_dielectric(dot(wi_l, wh), eta)
        mm_r = _mac_mic(wh, wi_l, wo, cos_i, True)
        mm_t = _mac_mic(wh, wi_l, wo, cos_i, False)

        spec_refl_act = active0 & reflect & mm_r & (F_sd > 0.0)
        cc_act = active0 & (clearcoat > 0.0) & reflect & mm_r & front
        st_act = active0 & (strans > 0.0) & (bsdf_w > 0.0) & refract & mm_t \
            & (F_sd < 1.0)
        diff_act = active0 & (brdf_w > 0.0) & reflect & front
        sheen_act = active0 & (sheen > 0.0) & reflect \
            & (1.0 - metallic > 0.0) & front

        D = mf.ggx_D(wh, ax, ay)
        G = mf.ggx_G(wi_l, wo, wh, ax, ay)
        dot_wi_h = dot(wi_l, wh)

        # principled_fresnel (principledhelpers.h:240-275)
        Fm = _calc_schlick3(base, dot_wi_h, eta)
        c_tint = Vec3(jnp.where(lum > 0.0, base.x / jnp.maximum(lum, 1e-12),
                                1.0),
                      jnp.where(lum > 0.0, base.y / jnp.maximum(lum, 1e-12),
                                1.0),
                      jnp.where(lum > 0.0, base.z / jnp.maximum(lum, 1e-12),
                                1.0))
        r0e = _schlick_r0_eta(jnp.where(dot_wi_h >= 0.0, eta, inv_eta))
        Ft = _calc_schlick3(Vec3(c_tint.x * r0e, c_tint.y * r0e,
                                 c_tint.z * r0e), dot_wi_h, eta)
        f_front_base = (1.0 - metallic) * (1.0 - spec_tint) * F_sd
        Fp = Vec3(f_front_base + metallic * Fm.x
                  + (1.0 - metallic) * spec_tint * Ft.x,
                  f_front_base + metallic * Fm.y
                  + (1.0 - metallic) * spec_tint * Ft.y,
                  f_front_base + metallic * Fm.z
                  + (1.0 - metallic) * spec_tint * Ft.z)
        Fp = where3(front, Fp, Vec3(bsdf_w * F_sd, bsdf_w * F_sd,
                                    bsdf_w * F_sd))

        spec_sc = jnp.where(spec_refl_act,
                            D * G / jnp.maximum(4.0 * jnp.abs(cos_i), 1e-12),
                            0.0)
        val = Vec3(Fp.x * spec_sc, Fp.y * spec_sc, Fp.z * spec_sc)

        # specular transmission (radiance transport scale), sqrt tint
        dot_wo_h = dot(wo, wh)
        denom = jnp.maximum((dot_wi_h + eta_path * dot_wo_h) ** 2, 1e-12)
        st_sc = jnp.where(
            st_act,
            bsdf_w * jnp.abs(inv_eta_path * inv_eta_path
                             * (1.0 - F_sd) * D * G * eta_path * eta_path
                             * dot_wi_h * dot_wo_h
                             / (cos_i * denom)), 0.0)
        val = Vec3(val.x + jnp.sqrt(jnp.maximum(base.x, 0.0)) * st_sc,
                   val.y + jnp.sqrt(jnp.maximum(base.y, 0.0)) * st_sc,
                   val.z + jnp.sqrt(jnp.maximum(base.z, 0.0)) * st_sc)

        # clearcoat (GTR1, Schlick 0.04, separable GGX1 G at alpha 0.25)
        Fcc = _calc_schlick1(jnp.float32(0.04), dot_wi_h, eta)
        Dcc = _gtr1_eval(wh.z, alpha_cc)
        Gcc = _smith_ggx1(wi_l, wh, 0.25) * _smith_ggx1(wo, wh, 0.25)
        cc = jnp.where(cc_act, 0.25 * clearcoat * Fcc * Dcc * Gcc
                       * jnp.abs(cos_o), 0.0)
        val = Vec3(val.x + cc, val.y + cc, val.z + cc)

        # diffuse + retro + fake subsurface
        Fo = _schlick_weight(jnp.abs(cos_o))
        Fi = _schlick_weight(jnp.abs(cos_i))
        f_diff = (1.0 - 0.5 * Fi) * (1.0 - 0.5 * Fo)
        cos_d = dot(wh, wo)
        Rr = 2.0 * rough * cos_d * cos_d
        f_retro = Rr * (Fo + Fi + Fo * Fi * (Rr - 1.0))
        Fss90 = 0.5 * Rr
        Fss = (1.0 + (Fss90 - 1.0) * Fo) * (1.0 + (Fss90 - 1.0) * Fi)
        f_ss = 1.25 * (Fss * (1.0 / jnp.maximum(
            jnp.abs(cos_o) + jnp.abs(cos_i), 1e-12) - 0.5) + 0.5)
        f_d = (1.0 - flatness) * (f_diff + f_retro) + flatness * f_ss
        dsc = jnp.where(diff_act,
                        brdf_w * jnp.abs(cos_o) * INV_PI * f_d, 0.0)
        val = Vec3(val.x + base.x * dsc, val.y + base.y * dsc,
                   val.z + base.z * dsc)

        # sheen (tinted towards the normalized base color)
        Fd = _schlick_weight(jnp.abs(cos_d))
        shn = jnp.where(sheen_act,
                        sheen * (1.0 - metallic) * Fd * jnp.abs(cos_o), 0.0)
        c_sheen = Vec3(1.0 + (c_tint.x - 1.0) * sheen_tint,
                       1.0 + (c_tint.y - 1.0) * sheen_tint,
                       1.0 + (c_tint.z - 1.0) * sheen_tint)
        val = Vec3(val.x + shn * c_sheen.x, val.y + shn * c_sheen.y,
                   val.z + shn * c_sheen.z)
        return val

    # --- NEE direction ----------------------------------------------------
    wo_nee_l = Vec3(wo_nee.x, wo_nee.y, wo_nee.z * sgn)
    val_nee = eval_f(wo_nee_l)
    pdf_nee = mixture_pdf(wo_nee_l)

    # --- sampling (principled.cpp:332-493) --------------------------------
    wi_f = _mulsign(wi_l, cos_i)
    m_spec, _ = mf.ggx_sample_vndf(wi_f, ax, ay, s2x, s2y)
    F_m, cos_t_m, eta_it_m, eta_ti_m = fresnel_dielectric(
        dot(wi_l, m_spec), eta)
    p_sr = jnp.where(front, ssrate * (1.0 - bsdf_w * (1.0 - F_m)), F_m)
    p_st = jnp.where(front, ssrate * bsdf_w * (1.0 - F_m), 1.0 - F_m)
    p_st = jnp.where(strans > 0.0, p_st, 0.0)
    p_cc = jnp.where(front, 0.25 * clearcoat * csrate, 0.0)
    p_d = jnp.where(front, brdf_w * dsrate, 0.0)
    rcp = 1.0 / jnp.maximum(p_sr + p_st + p_cc + p_d, 1e-12)
    p_d, p_cc, p_st = p_d * rcp, p_cc * rcp, p_st * rcp

    pick_d = s1 < p_d
    pick_cc = (~pick_d) & (s1 < p_d + p_cc)
    pick_st = (~pick_d) & (~pick_cc) & (s1 < p_d + p_cc + p_st)
    pick_sr = (~pick_d) & (~pick_cc) & (~pick_st)

    wo_d = warp.cosine_hemisphere_c(s2x, s2y)
    m_cc = _gtr1_sample(alpha_cc, s2x, s2y)
    wo_cc = _reflect(wi_l, m_cc)
    wo_st = _refract(wi_l, m_spec, cos_t_m, eta_ti_m)
    wo_sr = _reflect(wi_l, m_spec)

    wo = where3(pick_d, wo_d,
                where3(pick_cc, wo_cc, where3(pick_st, wo_st, wo_sr)))
    cos_o = wo.z
    ok_sr = _mac_mic(m_spec, wi_l, wo_sr, cos_i, True) & \
        (cos_i * wo_sr.z > 0.0)
    ok_st = _mac_mic(m_spec, wi_l, wo_st, cos_i, False) & \
        (cos_i * wo_st.z < 0.0)
    ok_cc = _mac_mic(m_cc, wi_l, wo_cc, cos_i, True) & \
        (cos_i * wo_cc.z > 0.0)
    ok_d = cos_i * wo_d.z > 0.0
    sel_ok = jnp.where(pick_d, ok_d, jnp.where(
        pick_cc, ok_cc, jnp.where(pick_st, ok_st, ok_sr)))

    pdf_s = mixture_pdf(wo)
    # a sample whose SELECTED lobe failed the macro/micro side test is a
    # REJECTION (the reference zero-weights it via `result & active`,
    # principled.cpp:488-492, and its chi2 BSDFAdapter drops zero-weight
    # samples from the histogram). Mark it by zeroing the returned pdf
    # too: its landing density is not mixture_pdf(wo), so keeping it
    # countable breaks any density consumer (chi2; MIS never sees it
    # since the weight is zero as well).
    ok_w = active0 & sel_ok & (pdf_s > 1e-12)
    val_s = eval_f(wo)
    inv_pdf = jnp.where(ok_w, 1.0 / jnp.maximum(pdf_s, 1e-12), 0.0)
    weight = Vec3(val_s.x * inv_pdf, val_s.y * inv_pdf, val_s.z * inv_pdf)
    pdf_out = jnp.where(ok_w, pdf_s, 0.0)

    bs_eta = jnp.where(pick_st & ok_w, eta_it_m, 1.0)
    z = jnp.zeros_like(cos_i)
    false_ = z > 1.0
    return BSDFSampleResult(val_nee, pdf_nee,
                            Vec3(wo.x, wo.y, wo.z * sgn), weight, pdf_out,
                            bs_eta, false_, false_)


# ---------------------------------------------------------------------------
# principledthin
# ---------------------------------------------------------------------------

def principledthin_eval_pdf_sample(P, param, wi: Vec3, wo_nee: Vec3, s1,
                                   s2x, s2y, tex_refl=None, tex_mask=None):
    """Thin principled BSDF (reference principledthin.cpp): symmetric thin
    sheet — lobes are spec reflect / spec "transmit" (reflect-and-flip with
    Burley-2015 scaled roughness), diffuse reflect (+retro, fake ss,
    sheen), diffuse transmit. No metallic/clearcoat in the thin model."""
    from . import BSDFSampleResult

    base = Vec3(param(P.P_REFL), param(P.P_REFL + 1), param(P.P_REFL + 2))
    if tex_refl is not None:
        base = where3(tex_mask, tex_refl, base)

    cos_ti = wi.z
    active0 = cos_ti != 0.0
    # thin sheet is symmetric: work on the |z| side, flip wo at the end
    sgn = jnp.sign(jnp.where(cos_ti == 0.0, 1.0, cos_ti))
    wi_l = Vec3(wi.x, wi.y, wi.z * sgn)
    cos_i = wi_l.z

    eta_t = param(P.P_ETA)
    eta_t = jnp.where(eta_t <= 0.0, 1.5, eta_t)
    ax = jnp.maximum(param(P.P_PR_AX), 1e-4)
    ay = jnp.maximum(param(P.P_PR_AY), 1e-4)
    spec_tint = param(P.P_SPECTUNE)
    sheen = param(P.P_PR_SHEEN)
    sheen_tint = param(P.P_PR_SHEENTINT)
    flatness = param(P.P_PR_FLAT)
    diff_trans = param(P.P_PR_CC) * 0.5          # slot reuse; range 0..2
    dt_srate = param(P.P_PR_CCGLOSS)             # slot reuse
    strans = param(P.P_PR_STRANS)
    dsrate = param(P.P_PR_DSRATE)
    sr_srate = param(P.P_PR_SSRATE)
    st_srate = param(P.P_PR_CSRATE)              # slot reuse
    rough = param(P.P_PR_ROUGH)
    lum = _luminance(base)

    # scaled distribution for thin transmission (Burley 2015, Fig. 15)
    aspect = jnp.sqrt(jnp.maximum(ay, 1e-8) / jnp.maximum(ax, 1e-8))
    r_scaled = (0.65 * eta_t - 0.35) * rough
    axs = jnp.maximum(1e-3, r_scaled * r_scaled / aspect)
    ays = jnp.maximum(1e-3, r_scaled * r_scaled * aspect)

    p_sr = strans * sr_srate * 0.5
    p_st = strans * st_srate * 0.5
    p_dr = dsrate * (1.0 - strans) * (1.0 - diff_trans)
    p_dt = dt_srate * (1.0 - strans) * diff_trans
    rcp = 1.0 / jnp.maximum(p_sr + p_st + p_dr + p_dt, 1e-12)
    p_sr, p_st, p_dr, p_dt = (p_sr * rcp, p_st * rcp, p_dr * rcp,
                              p_dt * rcp)

    def mixture_pdf(wo_t: Vec3):
        cos_o = wo_t.z
        reflect = cos_o > 0.0
        refract = cos_o < 0.0
        wo_r = Vec3(wo_t.x, wo_t.y, jnp.abs(wo_t.z))
        wh = normalize(Vec3(wi_l.x + wo_r.x, wi_l.y + wo_r.y,
                            wi_l.z + wo_r.z))
        mm_r = _mac_mic(wh, wi_l, wo_t, cos_i, True) & reflect
        mm_t = _mac_mic(wh, wi_l, wo_t, cos_i, False) & refract
        dot_wor_wh = dot(wo_r, wh)
        dwh_dwo = jnp.abs(1.0 / jnp.where(dot_wor_wh == 0.0, 1e12,
                                          4.0 * dot_wor_wh))
        pdf = jnp.where(mm_r & (strans > 0.0),
                        p_sr * mf.ggx_pdf_visible(wi_l, wh, ax, ay)
                        * dwh_dwo, 0.0)
        pdf += jnp.where(mm_t & (strans > 0.0),
                         p_st * mf.ggx_pdf_visible(wi_l, wh, axs, ays)
                         * dwh_dwo, 0.0)
        pdf += jnp.where(reflect, p_dr * INV_PI * jnp.maximum(cos_o, 0.0),
                         0.0)
        pdf += jnp.where(refract, p_dt * INV_PI * jnp.maximum(-cos_o, 0.0),
                         0.0)
        return jnp.where(active0, pdf, 0.0)

    def eval_f(wo_t: Vec3) -> Vec3:
        cos_o = wo_t.z
        reflect = cos_o > 0.0
        refract = cos_o < 0.0
        wo_r = Vec3(wo_t.x, wo_t.y, jnp.abs(wo_t.z))
        wh = normalize(Vec3(wi_l.x + wo_r.x, wi_l.y + wo_r.y,
                            wi_l.z + wo_r.z))
        mm_r = _mac_mic(wh, wi_l, wo_t, cos_i, True)
        mm_t = _mac_mic(wh, wi_l, wo_t, cos_i, False)
        F_sd, _, _, _ = fresnel_dielectric(dot(wi_l, wh), eta_t)

        sr_act = active0 & (strans > 0.0) & reflect & mm_r
        st_act = active0 & (strans > 0.0) & refract & mm_t
        dr_act = active0 & reflect & (strans < 1.0) & (diff_trans < 1.0)
        dt_act = active0 & refract & (strans < 1.0) & (diff_trans > 0.0)

        # thin fresnel blend (principledhelpers.h thin_fresnel)
        c_tint = Vec3(
            jnp.where(lum > 0.0, base.x / jnp.maximum(lum, 1e-12), 1.0),
            jnp.where(lum > 0.0, base.y / jnp.maximum(lum, 1e-12), 1.0),
            jnp.where(lum > 0.0, base.z / jnp.maximum(lum, 1e-12), 1.0))
        r0e = _schlick_r0_eta(eta_t)
        Fs = _calc_schlick3(Vec3(c_tint.x * r0e, c_tint.y * r0e,
                                 c_tint.z * r0e), dot(wi_l, wh), eta_t)
        F_thin = Vec3(F_sd + (Fs.x - F_sd) * spec_tint,
                      F_sd + (Fs.y - F_sd) * spec_tint,
                      F_sd + (Fs.z - F_sd) * spec_tint)

        D = mf.ggx_D(wh, ax, ay)
        G = mf.ggx_G(wi_l, wo_t, wh, ax, ay)
        sr_sc = jnp.where(sr_act, strans * D * G
                          / jnp.maximum(4.0 * cos_i, 1e-12), 0.0)
        val = Vec3(F_thin.x * sr_sc, F_thin.y * sr_sc, F_thin.z * sr_sc)

        Ds = mf.ggx_D(wh, axs, ays)
        Gs = mf.ggx_G(wi_l, wo_t, wh, axs, ays)
        st_sc = jnp.where(st_act, strans * (1.0 - F_sd) * Ds * Gs
                          / jnp.maximum(4.0 * cos_i, 1e-12), 0.0)
        val = Vec3(val.x + base.x * st_sc, val.y + base.y * st_sc,
                   val.z + base.z * st_sc)

        Fo = _schlick_weight(jnp.abs(cos_o))
        Fi = _schlick_weight(cos_i)
        f_diff = (1.0 - 0.5 * Fi) * (1.0 - 0.5 * Fo)
        cos_d = dot(wh, wo_t)
        Rr = 2.0 * rough * cos_d * cos_d
        f_retro = Rr * (Fo + Fi + Fo * Fi * (Rr - 1.0))
        Fss90 = 0.5 * Rr
        Fss = (1.0 + (Fss90 - 1.0) * Fo) * (1.0 + (Fss90 - 1.0) * Fi)
        f_ss = 1.25 * (Fss * (1.0 / jnp.maximum(
            jnp.abs(cos_o) + jnp.abs(cos_i), 1e-12) - 0.5) + 0.5)
        f_d = (1.0 - flatness) * (f_diff + f_retro) + flatness * f_ss
        dsc = jnp.where(dr_act, (1.0 - strans) * cos_o * INV_PI
                        * (1.0 - diff_trans) * f_d, 0.0)
        val = Vec3(val.x + base.x * dsc, val.y + base.y * dsc,
                   val.z + base.z * dsc)

        Fd = _schlick_weight(jnp.abs(cos_d))
        shn = jnp.where(dr_act & (sheen > 0.0),
                        sheen * (1.0 - strans) * Fd * (1.0 - diff_trans)
                        * jnp.abs(cos_o), 0.0)
        c_sheen = Vec3(1.0 + (c_tint.x - 1.0) * sheen_tint,
                       1.0 + (c_tint.y - 1.0) * sheen_tint,
                       1.0 + (c_tint.z - 1.0) * sheen_tint)
        val = Vec3(val.x + shn * c_sheen.x, val.y + shn * c_sheen.y,
                   val.z + shn * c_sheen.z)

        dtc = jnp.where(dt_act, (1.0 - strans) * diff_trans * INV_PI
                        * jnp.abs(cos_o), 0.0)
        return Vec3(val.x + base.x * dtc, val.y + base.y * dtc,
                    val.z + base.z * dtc)

    wo_nee_t = Vec3(wo_nee.x, wo_nee.y, wo_nee.z * sgn)
    val_nee = eval_f(wo_nee_t)
    pdf_nee = mixture_pdf(wo_nee_t)

    # --- sampling ----------------------------------------------------------
    pick_sr = (strans > 0.0) & (s1 < p_sr)
    pick_st = (strans > 0.0) & (~pick_sr) & (s1 < p_sr + p_st)
    pick_dr = (~pick_sr) & (~pick_st) & (s1 < p_sr + p_st + p_dr)
    pick_dt = (~pick_sr) & (~pick_st) & (~pick_dr)

    m_r, _ = mf.ggx_sample_vndf(wi_l, ax, ay, s2x, s2y)
    wo_sr = _reflect(wi_l, m_r)
    m_t, _ = mf.ggx_sample_vndf(wi_l, axs, ays, s2x, s2y)
    wo_rt = _reflect(wi_l, m_t)
    wo_st = Vec3(wo_rt.x, wo_rt.y, -wo_rt.z)
    wo_dr = warp.cosine_hemisphere_c(s2x, s2y)
    wo_dt = Vec3(wo_dr.x, wo_dr.y, -wo_dr.z)

    wo_t = where3(pick_sr, wo_sr,
                  where3(pick_st, wo_st, where3(pick_dr, wo_dr, wo_dt)))
    ok_sr = _mac_mic(m_r, wi_l, wo_sr, cos_i, True) & (wo_sr.z > 0.0)
    ok_st = _mac_mic(m_t, wi_l, wo_st, cos_i, False) & (wo_st.z < 0.0)
    sel_ok = jnp.where(pick_sr, ok_sr, jnp.where(pick_st, ok_st, True))

    pdf_s = mixture_pdf(wo_t)
    # see principled: a selection-rejected sample zeroes weight AND pdf
    ok_w = active0 & sel_ok & (pdf_s > 1e-12)
    val_s = eval_f(wo_t)
    inv_pdf = jnp.where(ok_w, 1.0 / jnp.maximum(pdf_s, 1e-12), 0.0)
    weight = Vec3(val_s.x * inv_pdf, val_s.y * inv_pdf, val_s.z * inv_pdf)
    pdf_out = jnp.where(ok_w, pdf_s, 0.0)

    z = jnp.zeros_like(cos_i)
    false_ = z > 1.0
    return BSDFSampleResult(val_nee, pdf_nee,
                            Vec3(wo_t.x, wo_t.y, wo_t.z * sgn), weight,
                            pdf_out, jnp.ones_like(z), false_, false_)
