"""Measured polarized pBRDF tables (reference src/bsdfs/
measured_polarized.cpp; Baek et al. 2020 KAIST pBRDF dataset).

Tensor-file fields (measured_polarized.cpp:125-153): ``theta_h`` (1, Nh),
``theta_d`` (1, Nd), ``phi_d`` (1, Np) float32 grids, ``wvls`` (Nw,)
uint16 wavelengths, ``M`` (Np, Nd, Nh, Nw, 4, 4) float32 Mueller matrices
in the Rusinkiewicz parameterization. Evaluation is 4-D multilinear
interpolation over (phi_d, theta_d, theta_h, wavelength) — the reference
wraps the same lookup in a Marginal2D<4> used purely as an interpolator.

Sampling (measured_polarized.cpp:177-210, 333-344): a fixed mixture of
cosine-hemisphere (weight 0.1) and GGX(alpha_sample) visible-normal
reflection; the pdf is the matching mixture.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.vec import Vec3, dot, cross, normalize, where3
from ..core import mueller as mu

COSINE_HEMISPHERE_PDF_WEIGHT = 0.1
# representative rgb band centers within the dataset's 450-650nm coverage
RGB_WAVELENGTHS = (620.0, 550.0, 465.0)


class PbsdfTables(NamedTuple):
    phi_d: jnp.ndarray    # (Np,)
    theta_d: jnp.ndarray  # (Nd,)
    theta_h: jnp.ndarray  # (Nh,)
    wvls: jnp.ndarray     # (Nw,)
    M: jnp.ndarray        # (Np*Nd*Nh*Nw, 16) flattened Mueller entries


def build_pbsdf_tables(fields) -> PbsdfTables:
    th = np.asarray(fields["theta_h"], np.float32).reshape(-1)
    td = np.asarray(fields["theta_d"], np.float32).reshape(-1)
    pd = np.asarray(fields["phi_d"], np.float32).reshape(-1)
    wv = np.asarray(fields["wvls"], np.float32).reshape(-1)
    M = np.asarray(fields["M"], np.float32)
    expect = (pd.size, td.size, th.size, wv.size, 4, 4)
    if M.shape != expect:
        raise RuntimeError(
            f"pbsdf: M shape {M.shape} does not match grids {expect} "
            "(measured_polarized.cpp:131-153 layout)")
    return PbsdfTables(jnp.asarray(pd), jnp.asarray(td), jnp.asarray(th),
                       jnp.asarray(wv), jnp.asarray(M.reshape(-1, 16)))


def _interp_axis(grid, x):
    """Clamped linear interpolation weights on a sorted 1-D grid."""
    K = int(grid.shape[0])
    i1 = jnp.clip(jnp.searchsorted(grid, x, side="right"), 1, K - 1)
    i0 = i1 - 1
    g0 = grid[i0]
    g1 = grid[i1]
    t = jnp.clip((x - g0) / jnp.maximum(g1 - g0, 1e-12), 0.0, 1.0)
    return i0, i1, t


def pbsdf_fetch16(tbl: PbsdfTables, pd, td, th, lam):
    """16 interpolated Mueller entries (row-major) at per-lane
    (phi_d, theta_d, theta_h, wavelength). NaN-invalid cells zero the whole
    matrix (measured_polarized.cpp:283-287); entry 0 is clamped >= 0."""
    Np = int(tbl.phi_d.shape[0])
    Nd = int(tbl.theta_d.shape[0])
    Nh = int(tbl.theta_h.shape[0])
    Nw = int(tbl.wvls.shape[0])
    ip0, ip1, tp = _interp_axis(tbl.phi_d, pd)
    id0, id1, tdt = _interp_axis(tbl.theta_d, td)
    ih0, ih1, tht = _interp_axis(tbl.theta_h, th)
    iw0, iw1, twt = _interp_axis(tbl.wvls, lam)

    out = [0.0] * 16
    for bp, ip, wp in ((0, ip0, 1.0 - tp), (1, ip1, tp)):
        for bd, idx_d, wd in ((0, id0, 1.0 - tdt), (1, id1, tdt)):
            for bh, ih, wh in ((0, ih0, 1.0 - tht), (1, ih1, tht)):
                for bw, iw, ww in ((0, iw0, 1.0 - twt), (1, iw1, twt)):
                    w = wp * wd * wh * ww
                    lin = ((ip * Nd + idx_d) * Nh + ih) * Nw + iw
                    rows = tbl.M[lin]          # (n, 16) after fancy index
                    for e in range(16):
                        out[e] = out[e] + w * rows[..., e]
    bad = ~jnp.isfinite(out[0])
    for e in range(16):
        out[e] = jnp.where(bad | ~jnp.isfinite(out[e]), 0.0, out[e])
    out[0] = jnp.maximum(out[0], 0.0)
    return out


def _phi(v: Vec3):
    p = jnp.arctan2(v.y, v.x)
    return jnp.where(p < 0.0, p + 2.0 * np.pi, p)


def _rotate_z(v: Vec3, angle):
    """Rotate about +z (the reference's rotate_vector with axis (0,0,1))."""
    s = jnp.sin(angle)
    c = jnp.cos(angle)
    return Vec3(v.x * c - v.y * s, v.x * s + v.y * c, v.z)


def rusinkiewicz(i: Vec3, o: Vec3):
    """(phi_d, theta_h, theta_d) (measured_polarized.cpp:374-391)."""
    h = normalize(i + o)
    bx, by = -h.y, h.x                       # cross(n=(0,0,1), h), un-norm
    bl = jnp.sqrt(jnp.maximum(bx * bx + by * by, 1e-18))
    b = Vec3(bx / bl, by / bl, jnp.zeros_like(bl))
    t = normalize(cross(b, h))
    td = jnp.arccos(jnp.clip(dot(h, i), -1.0, 1.0))
    th = jnp.arccos(jnp.clip(h.z, -1.0, 1.0))
    i_prj = normalize(i - h * dot(i, h))
    cos_pd = jnp.clip(dot(t, i_prj), -1.0, 1.0)
    sin_pd = jnp.clip(dot(b, i_prj), -1.0, 1.0)
    pd = jnp.arctan2(sin_pd, cos_pd)
    return pd, th, td


def pbsdf_eval_mueller(tbl: PbsdfTables, wi: Vec3, wo: Vec3,
                       wavelengths=RGB_WAVELENGTHS):
    """Full 4x4 Mueller eval in the LOCAL frame w.r.t. the implicit Stokes
    bases of (-wo_hat, wi_hat), rgb via three band-center wavelengths
    (measured_polarized.cpp:215-299). Radiance transport: light arrives
    along -wo_hat = -wo, leaves along wi_hat = wi. Includes cos_theta_o.

    Returns a Mueller 16-tuple of Vec3 (core.mueller layout)."""
    wo_hat, wi_hat = wo, wi
    phi_std = _phi(wi_hat)
    wo_std = _rotate_z(wo_hat, -phi_std)
    wi_std = _rotate_z(wi_hat, -phi_std)
    pd, th, td = rusinkiewicz(wo_std, wi_std)

    entries_rgb = []
    for lam in wavelengths:
        lam_arr = jnp.full_like(pd, np.float32(lam))
        entries_rgb.append(pbsdf_fetch16(tbl, pd, td, th, lam_arr))
    M = tuple(Vec3(entries_rgb[0][e], entries_rgb[1][e], entries_rgb[2][e])
              for e in range(16))

    # Stokes frame of the measurement: reflection-plane bases (Figure 4)
    zo = -wo_std
    to = normalize(cross(wo_std - wi_std, zo))
    yo = normalize(cross(to, zo))
    xo = cross(yo, zo)
    zi = wi_std
    ti = normalize(cross(wi_std - wo_std, zi))
    yi = normalize(cross(ti, zi))
    xi = cross(yi, zi)
    # undo the phi_std rotation on the frame vectors, then rotate into the
    # implicit local Stokes bases
    xo_hat = _rotate_z(xo, phi_std)
    xi_hat = _rotate_z(xi, phi_std)
    M = mu.rotate_mueller_basis(M,
                                -wo_hat, xo_hat, mu.stokes_basis(-wo_hat),
                                wi_hat, xi_hat, mu.stokes_basis(wi_hat))
    cos_o = jnp.maximum(wo.z, 0.0)
    return mu.mm_scale(M, Vec3(cos_o, cos_o, cos_o))


def _mixture_pdf(wi: Vec3, wo: Vec3, alpha, clip: bool = True):
    """Mixture pdf (measured_polarized.cpp pdf()). ``clip=True`` gates on
    cos_theta_o > 0 as the reference's BSDF pdf does — GGX reflections can
    leak below the horizon and become zero-weight dead samples;
    ``clip=False`` gives the raw sampling density over the full sphere
    (used by the chi2 test)."""
    from ..core import microfacet as mf
    h = normalize(wi + wo)
    pdf_d = jnp.maximum(wo.z, 0.0) / np.pi
    pdf_m = mf.ggx_pdf_visible(wi, h, alpha, alpha) / jnp.maximum(
        4.0 * jnp.abs(dot(wo, h)), 1e-9)
    p = (COSINE_HEMISPHERE_PDF_WEIGHT * pdf_d
         + (1.0 - COSINE_HEMISPHERE_PDF_WEIGHT) * pdf_m)
    ok = (wi.z > 0.0) & (wo.z > 0.0) if clip else (wi.z > 0.0)
    return jnp.where(ok, p, 0.0)


def pbsdf_eval_pdf_sample(tbl: PbsdfTables, alpha, wi: Vec3, wo_nee: Vec3,
                          s1, s2x, s2y, wavelengths=RGB_WAVELENGTHS):
    """Scalar (intensity, M00) path for the unpolarized variants and for
    the polarized loop's importance weights. Mirrors
    measured_polarized.cpp sample()/pdf()/eval() with value = M00 * cos."""
    from ..core import warp as cwarp
    from ..core import microfacet as mf
    from . import BSDFSampleResult

    n = wi.x.shape[0]
    f32 = jnp.float32

    def m00(wo):
        pd_, th_, td_ = rusinkiewicz(
            _rotate_z(wo, -_phi(wi)), _rotate_z(wi, -_phi(wi)))
        vals = []
        for lam in wavelengths:
            lam_arr = jnp.full_like(pd_, np.float32(lam))
            vals.append(pbsdf_fetch16(tbl, pd_, td_, th_, lam_arr)[0])
        return Vec3(vals[0], vals[1], vals[2])

    # ---- NEE eval: f * cos ------------------------------------------------
    ok_nee = (wi.z > 0.0) & (wo_nee.z > 0.0)
    val_nee = m00(wo_nee) * jnp.where(ok_nee, jnp.maximum(wo_nee.z, 0.0),
                                      0.0)
    pdf_nee = _mixture_pdf(wi, wo_nee, alpha)

    # ---- sample: cosine/GGX mixture --------------------------------------
    diffuse_lobe = s1 < COSINE_HEMISPHERE_PDF_WEIGHT
    wo_d = cwarp.cosine_hemisphere_c(s2x, s2y)
    m, _ = mf.ggx_sample_vndf(wi, alpha, alpha, s2x, s2y)
    wo_m = m * (2.0 * dot(wi, m)) - wi
    wo = where3(diffuse_lobe, wo_d, wo_m)
    pdf = _mixture_pdf(wi, wo, alpha)
    ok = (wi.z > 0.0) & (wo.z > 0.0) & (pdf > 1e-9)
    w = m00(wo) * jnp.where(ok, jnp.maximum(wo.z, 0.0)
                            / jnp.maximum(pdf, 1e-9), 0.0)
    z = jnp.zeros((n,), f32)
    return BSDFSampleResult(
        val_nee=val_nee, pdf_nee=pdf_nee, wo=wo, weight=w, pdf=pdf,
        eta=jnp.ones((n,), f32),
        sampled_delta=jnp.zeros((n,), bool),
        sampled_null=jnp.zeros((n,), bool))


__all__ = ["PbsdfTables", "build_pbsdf_tables", "pbsdf_fetch16",
           "pbsdf_eval_mueller", "pbsdf_eval_pdf_sample", "rusinkiewicz",
           "RGB_WAVELENGTHS", "COSINE_HEMISPHERE_PDF_WEIGHT"]
