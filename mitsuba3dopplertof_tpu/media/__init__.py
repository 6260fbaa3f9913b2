"""Participating media + phase functions (reference src/media/{homogeneous,
heterogeneous}.cpp, src/phase/*.cpp, src/volumes/*.cpp).

v1 supports homogeneous media with isotropic / Henyey-Greenstein / Rayleigh
phase functions, attached to shape interiors or the sensor (global fog).
Heterogeneous (gridvolume-driven) media parse and fall back to their mean
density with a warning — the Pallas 3D-DDA transmittance kernel lands next
round.
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..core.properties import Properties, register_plugin
from ..core.vec import Vec3, dot, normalize
from ..core.math import PI, TWO_PI

PHASE_ISOTROPIC = 0
PHASE_HG = 1
PHASE_RAYLEIGH = 2
PHASE_SGGX = 3
PHASE_TAB = 4

N_MED_PARAMS = 27
M_SIGMA_T = 0    # rgb extinction (heterogeneous: gray majorant-free base)
M_ALBEDO = 3     # rgb single-scattering albedo
M_G = 6          # HG asymmetry
M_SCALE = 7
M_MAXD = 8       # heterogeneous: majorant sigma_t = scale * max(grid); 0 = homogeneous
M_GRID_OFF = 9   # heterogeneous: offset into the flat grid atlas
M_NX = 10        # grid resolution
M_NY = 11
M_NZ = 12
M_PHASE = 13     # 0 = isotropic/HG (M_G), 1 = SGGX microflakes
M_SGGX = 14      # SGGX S-matrix entries Sxx,Syy,Szz,Sxy,Sxz,Syz (14:20)
M_ST_PEAK = 20   # tpu_spectral: sigma_t peak; M_SIGMA_T then holds sigmoid
                 # upsampling coefficients (albedo coeffs ride M_ALBEDO)
M_SGGX_OFF = 21  # spatially-varying SGGX: row offset into the (V, 6)
M_SGGX_NX = 22   # S-grid atlas (sa.sggx_grid) + its resolution; NX == 0
M_SGGX_NY = 23   # means "constant S" (M_SGGX entries). World->grid
M_SGGX_NZ = 24   # transform rides sa.sggx_w2g (12, n_media).
M_FILTER = 25    # grid interpolation: 0 = trilinear, 1 = nearest
M_SAMPLE_EM = 26 # 1 = NEE from medium events (medium.h sample_emitters)


def _get_rgb(props, key, default):
    v = props.get(key, default)
    from ..spectra import Spectrum
    from ..textures import Texture
    from ..volumes import Volume
    if isinstance(v, (Spectrum, Texture, Volume)):
        return np.asarray(v.mean_rgb())
    if isinstance(v, dict):
        v = v.get("value")
    a = np.asarray(v, dtype=np.float64).reshape(-1)
    if a.size == 1:
        a = np.repeat(a, 3)
    return a[:3]


class PhaseFunction:
    type_id = PHASE_ISOTROPIC
    g = 0.0

    def __init__(self, props: Properties):
        self.id = props.id


@register_plugin("phase", "isotropic")
class IsotropicPhase(PhaseFunction):
    """reference src/phase/isotropic.cpp."""
    type_id = PHASE_ISOTROPIC


@register_plugin("phase", "hg")
class HGPhase(PhaseFunction):
    """Henyey-Greenstein (reference src/phase/hg.cpp)."""
    type_id = PHASE_HG

    def __init__(self, props: Properties):
        super().__init__(props)
        self.g = props.get_float("g", 0.8)


@register_plugin("phase", "rayleigh")
class RayleighPhase(PhaseFunction):
    """reference src/phase/rayleigh.cpp."""
    type_id = PHASE_RAYLEIGH


@register_plugin("phase", "blendphase")
class BlendPhase(PhaseFunction):
    """reference src/phase/blendphase.cpp — weighted mix; v1 reduces to the
    weight-interpolated HG asymmetry."""

    def __init__(self, props: Properties):
        super().__init__(props)
        children = [v for _, v in props.objects()
                    if isinstance(v, PhaseFunction)]
        w = props.get_float("weight", 0.5)
        gs = [getattr(c, "g", 0.0) for c in children] or [0.0]
        self.g = float((1 - w) * gs[0] + w * (gs[-1]))
        self.type_id = PHASE_HG if abs(self.g) > 1e-4 else PHASE_ISOTROPIC


@register_plugin("phase", "tabphase")
class TabulatedPhase(PhaseFunction):
    """reference src/phase/tabphase.cpp — piecewise-linear phase function
    of cos(theta) over [-1, 1] (forward convention: theta between the
    propagation direction and wo, tabphase.cpp:115 cos = -dot(wo, wi)),
    sampled by exact inversion of the trapezoid-integrated CDF (the
    ContinuousDistribution semantics, distr_1d.h)."""

    type_id = PHASE_TAB

    def __init__(self, props: Properties):
        super().__init__(props)
        vals = props.get("values", [1.0])
        if isinstance(vals, str):
            vals = [float(x) for x in vals.replace(",", " ").split()]
        v = np.asarray(vals, np.float64)
        if v.size < 2:
            v = np.repeat(v, 2)
        if (v < 0).any() or v.max() <= 0:
            raise RuntimeError("tabphase: values must be >= 0, not all 0")
        self.values = v
        cos = np.linspace(-1, 1, len(v))
        self.g = float((v * cos).sum() / max(v.sum(), 1e-9))


@register_plugin("phase", "sggx")
class SGGXPhase(PhaseFunction):
    """SGGX specular microflakes (reference src/phase/sggx.cpp +
    include/mitsuba/render/microflake.h, Heitz et al. 2015). The S matrix
    comes from a 6-value constvolume child, or — spatially varying — a
    6-channel gridvolume evaluated per interaction (sggx.cpp eval_ndf_params
    -> Volume::eval_6), matching the reference's trilinear grid lookup."""

    type_id = 3          # PHASE_SGGX

    def __init__(self, props: Properties):
        super().__init__(props)
        from ..volumes import Volume, GridVolume
        S = None
        self.S_grid = None   # GridVolume with 6 channels, or None
        for key, v in props.objects():
            if isinstance(v, Volume):
                if isinstance(v, GridVolume):
                    if v.data.shape[-1] < 6:
                        raise RuntimeError(
                            "sggx: S gridvolume must have 6 channels "
                            "(Sxx, Syy, Szz, Sxy, Sxz, Syz), got "
                            f"{v.data.shape[-1]}")
                    self.S_grid = v
                    # channel means remain as the constant fallback row
                    # (unused when the grid path is engaged)
                    S = v.data[..., :6].reshape(-1, 6).mean(
                        axis=0).astype(np.float64)
                else:
                    vals = getattr(v, "values_raw", None)
                    if vals is None:
                        vals = getattr(v, "value", None)
                    S = np.asarray(vals, np.float64).reshape(-1)
        if S is None and props.has_property("S"):
            S = np.asarray(props.get("S"), np.float64).reshape(-1)
        if S is None or S.size < 6:
            raise RuntimeError("sggx: provide an 'S' volume with six values "
                               "(Sxx, Syy, Szz, Sxy, Sxz, Syz)")
        self.S = S[:6]


class Medium:
    def __init__(self, props: Properties):
        self.id = props.id
        self.phase = None
        for key, v in props.objects():
            if isinstance(v, PhaseFunction):
                self.phase = v
        if self.phase is None:
            self.phase = IsotropicPhase(Properties("isotropic"))

    def params_row(self) -> np.ndarray:
        return np.zeros(N_MED_PARAMS)


@register_plugin("medium", "homogeneous")
class HomogeneousMedium(Medium):
    """reference src/media/homogeneous.cpp — sigma_t & albedo constants."""

    def __init__(self, props: Properties):
        super().__init__(props)
        self.scale = props.get_float("scale", 1.0)
        if props.has_property("sigma_t"):
            self.sigma_t = _get_rgb(props, "sigma_t", [1, 1, 1]) * self.scale
            self.albedo = _get_rgb(props, "albedo", [0.75, 0.75, 0.75])
        else:
            sigma_s = _get_rgb(props, "sigma_s", [1, 1, 1]) * self.scale
            sigma_a = _get_rgb(props, "sigma_a", [0.5, 0.5, 0.5]) * self.scale
            self.sigma_t = sigma_s + sigma_a
            self.albedo = sigma_s / np.maximum(self.sigma_t, 1e-9)
        self.sample_emitters = props.get_bool("sample_emitters", True)

    def params_row(self):
        p = np.zeros(N_MED_PARAMS)
        p[M_SIGMA_T:M_SIGMA_T + 3] = self.sigma_t
        p[M_ALBEDO:M_ALBEDO + 3] = self.albedo
        p[M_G] = getattr(self.phase, "g", 0.0)
        p[M_SCALE] = self.scale
        p[M_SAMPLE_EM] = 1.0 if self.sample_emitters else 0.0
        # M_PHASE kernel codes: 0 = HG/isotropic (M_G), 1 = SGGX,
        # 2 = Rayleigh, 3 = tabulated (table via sa.tab_phase_tables)
        tid = getattr(self.phase, "type_id", 0)
        if tid == PHASE_SGGX:
            p[M_PHASE] = 1.0
            p[M_SGGX:M_SGGX + 6] = self.phase.S
        elif tid == PHASE_RAYLEIGH:
            p[M_PHASE] = 2.0
        elif tid == PHASE_TAB:
            p[M_PHASE] = 3.0
        return p


@register_plugin("medium", "heterogeneous")
class HeterogeneousMedium(HomogeneousMedium):
    """reference src/media/heterogeneous.cpp. Grid-driven extinction
    sigma_t(x) = scale * grid(x) sampled with unbiased delta tracking and
    shadow transmittance by ratio tracking (integrators/volpath.py), both
    against the majorant scale*max(grid). Extinction is treated as gray
    (the scalar grid channel); albedo stays rgb. Non-grid (constvolume/rgb)
    sigma_t reduces to the homogeneous closed form."""

    def __init__(self, props: Properties):
        from ..volumes import Volume, GridVolume
        self.grid = None
        sigma_t_vol = None
        for key, v in props.objects():
            if isinstance(v, Volume) and key == "sigma_t":
                sigma_t_vol = v
        if isinstance(sigma_t_vol, GridVolume):
            self.grid = sigma_t_vol
            # gray base; the grid carries the spatial variation
            props["sigma_t"] = {"type": "rgb", "value": [1.0, 1.0, 1.0]}
        elif sigma_t_vol is not None:
            props["sigma_t"] = {"type": "rgb",
                                "value": list(sigma_t_vol.mean_rgb())}
        super().__init__(props)

    def params_row(self):
        p = super().params_row()
        if self.grid is not None:
            p[M_MAXD] = self.scale * self.grid.max()
            g = self.grid.scalar_grid()
            p[M_NX], p[M_NY], p[M_NZ] = g.shape[2], g.shape[1], g.shape[0]
            p[M_FILTER] = (1.0 if getattr(self.grid, "filter_type", "")
                           == "nearest" else 0.0)
        return p


# ---------------------------------------------------------------------------
# Device-side phase sampling/eval (component-wise)
# ---------------------------------------------------------------------------

def hg_sample(wi: Vec3, g, s1, s2):
    """Sample HG around -wi (forward scattering convention: wo distributed
    about the propagation direction d = -wi)."""
    d = -wi
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sqr_term = (1.0 - g * g) / (1.0 - g + 2.0 * g * s1)
    cos_theta = jnp.where(
        jnp.abs(g) < 1e-3,
        1.0 - 2.0 * s1,
        (1.0 + g * g - sqr_term * sqr_term) / (2.0 * g_safe))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = TWO_PI * s2
    from ..core.vec import coordinate_system
    t1, t2 = coordinate_system(d)
    wo = (t1 * (sin_theta * jnp.cos(phi)) + t2 * (sin_theta * jnp.sin(phi))
          + d * cos_theta)
    pdf = hg_eval(cos_theta, g)
    return wo, pdf


def hg_eval(cos_forward, g):
    """HG phase, FORWARD convention: cos_forward = dot(propagation, wo);
    peaks at +1 for g > 0 (equivalent to reference hg.cpp's
    1 + g^2 + 2g*dot(wi,wo) with wi pointing toward the source)."""
    denom = 1.0 + g * g - 2.0 * g * cos_forward
    return (1.0 / (4.0 * PI)) * (1.0 - g * g) / jnp.maximum(
        denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def sggx_projected_area(w: Vec3, S):
    """sqrt(w^T S w) (reference microflake.h:118-128)."""
    sxx, syy, szz, sxy, sxz, syz = S
    s2 = (w.x * w.x * sxx + w.y * w.y * syy + w.z * w.z * szz
          + 2.0 * (w.x * w.y * sxy + w.x * w.z * sxz + w.y * w.z * syz))
    return jnp.sqrt(jnp.maximum(s2, 1e-18))


def sggx_ndf_pdf(wm: Vec3, S):
    """SGGX NDF (reference microflake.h:86-103)."""
    sxx, syy, szz, sxy, sxz, syz = S
    det = jnp.abs(sxx * syy * szz - sxx * syz * syz - syy * sxz * sxz
                  - szz * sxy * sxy + 2.0 * sxy * sxz * syz)
    den = (wm.x * wm.x * (syy * szz - syz * syz)
           + wm.y * wm.y * (sxx * szz - sxz * sxz)
           + wm.z * wm.z * (sxx * syy - sxy * sxy)
           + 2.0 * (wm.x * wm.y * (sxz * syz - szz * sxy)
                    + wm.x * wm.z * (sxy * syz - syy * sxz)
                    + wm.y * wm.z * (sxy * sxz - sxx * syz)))
    return (jnp.maximum(det, 0.0) * jnp.sqrt(jnp.maximum(det, 0.0))
            / (PI * jnp.maximum(den * den, 1e-18)))


def sggx_sample_vndf(wi: Vec3, s2x, s2y, S):
    """Sample a visible microflake normal (microflake.h:36-60)."""
    from ..core.vec import coordinate_system, normalize as _norm
    from ..core import warp as _warp
    ek, ej = coordinate_system(wi)
    ei = wi
    sxx, syy, szz, sxy, sxz, syz = S

    def quad(a: Vec3, b: Vec3):
        # a^T S b
        return (a.x * b.x * sxx + a.y * b.y * syy + a.z * b.z * szz
                + (a.x * b.y + a.y * b.x) * sxy
                + (a.x * b.z + a.z * b.x) * sxz
                + (a.y * b.z + a.z * b.y) * syz)

    s_kk = quad(ek, ek)
    s_jj = quad(ej, ej)
    s_ii = quad(ei, ei)
    s_kj = quad(ek, ej)
    s_ki = quad(ek, ei)
    s_ji = quad(ej, ei)

    det = (s_kk * s_jj * s_ii - s_kk * s_ji * s_ji - s_jj * s_ki * s_ki
           - s_ii * s_kj * s_kj + 2.0 * s_kj * s_ki * s_ji)
    inv_sqrt_ii = jax.lax.rsqrt(jnp.maximum(s_ii, 1e-18))
    tmp = jnp.sqrt(jnp.maximum(s_jj * s_ii - s_ji * s_ji, 1e-18))
    mk = (jnp.sqrt(jnp.maximum(jnp.abs(det), 0.0)) / tmp,
          jnp.zeros_like(tmp), jnp.zeros_like(tmp))
    mj = (-inv_sqrt_ii * (s_ki * s_ji - s_kj * s_ii) / tmp,
          inv_sqrt_ii * tmp, jnp.zeros_like(tmp))
    mi_ = (inv_sqrt_ii * s_ki, inv_sqrt_ii * s_ji, inv_sqrt_ii * s_ii)

    uvw = _warp.cosine_hemisphere_c(s2x, s2y)
    lx = uvw.x * mk[0] + uvw.y * mj[0] + uvw.z * mi_[0]
    ly = uvw.y * mj[1] + uvw.z * mi_[1]
    lz = uvw.z * mi_[2]
    ln = jnp.sqrt(jnp.maximum(lx * lx + ly * ly + lz * lz, 1e-18))
    lx, ly, lz = lx / ln, ly / ln, lz / ln
    return _norm(ek * lx + ej * ly + ei * lz)


def sggx_sample(wi: Vec3, s2x, s2y, S):
    """Specular microflake scattering: reflect wi about a sampled visible
    normal; pdf == phase value (perfect importance sampling,
    sggx.cpp:86-105)."""
    from ..core.vec import normalize as _norm
    n = sggx_sample_vndf(wi, s2x, s2y, S)
    d = 2.0 * (wi.x * n.x + wi.y * n.y + wi.z * n.z)
    wo = _norm(Vec3(n.x * d - wi.x, n.y * d - wi.y, n.z * d - wi.z))
    pdf = 0.25 * sggx_ndf_pdf(n, S) / sggx_projected_area(wi, S)
    return wo, pdf


def sggx_eval(wi: Vec3, wo: Vec3, S):
    """sggx.cpp eval: 0.25 * D(h) / sigma(wi) with h = normalize(wi+wo)."""
    from ..core.vec import normalize as _norm
    h = _norm(wi + wo)
    return 0.25 * sggx_ndf_pdf(h, S) / sggx_projected_area(wi, S)


def rayleigh_eval(cos_theta):
    return 3.0 / (16.0 * PI) * (1.0 + cos_theta * cos_theta)


def rayleigh_sample(wi: Vec3, s1, s2):
    """Exact inverse-CDF sample of the Rayleigh phase around the
    propagation direction (reference src/phase/rayleigh.cpp sample):
    solve c^3 + 3c = 4(2u - 1) via Cardano."""
    z = 4.0 * (2.0 * s1 - 1.0)          # in [-4, 4]
    disc = jnp.sqrt(z * z + 4.0)
    a = jnp.cbrt(0.5 * (z + disc))
    b = jnp.cbrt(0.5 * (z - disc))      # jnp.cbrt handles negatives
    cos_theta = jnp.clip(a + b, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = TWO_PI * s2
    from ..core.vec import coordinate_system
    d = -wi
    t1, t2 = coordinate_system(d)
    wo = (t1 * (sin_theta * jnp.cos(phi)) + t2 * (sin_theta * jnp.sin(phi))
          + d * cos_theta)
    return wo, rayleigh_eval(cos_theta)


def tab_phase_tables(values: np.ndarray):
    """Host-side tables for a tabulated phase function: (grid, vals, cdf,
    inv_norm) with cdf the trapezoid-integrated piecewise-linear pdf
    (reference ContinuousDistribution, distr_1d.h)."""
    v = np.asarray(values, np.float64)
    K = v.size
    grid = np.linspace(-1.0, 1.0, K)
    dx = grid[1] - grid[0]
    seg = 0.5 * (v[:-1] + v[1:]) * dx
    cdf = np.concatenate([[0.0], np.cumsum(seg)])
    total = cdf[-1]
    return (grid.astype(np.float32), v.astype(np.float32),
            (cdf / total).astype(np.float32), np.float32(1.0 / total))


def tab_eval(cos_theta, grid, vals, inv_norm):
    """Normalized solid-angle phase value (tabphase.cpp:100-116:
    eval_pdf_normalized / (2 pi))."""
    f = jnp.interp(cos_theta, jnp.asarray(grid), jnp.asarray(vals))
    return f * inv_norm * (1.0 / TWO_PI)


def tab_sample(wi: Vec3, s1, s2, grid, vals, cdf, inv_norm):
    """Exact inversion of the trapezoid CDF: locate the segment, solve the
    quadratic for the linear-pdf segment (ContinuousDistribution::sample)."""
    g_ = jnp.asarray(grid)
    v_ = jnp.asarray(vals)
    c_ = jnp.asarray(cdf)
    K = int(g_.shape[0])
    i = jnp.clip(jnp.searchsorted(c_, s1, side="right") - 1, 0, K - 2)
    c0 = g_[i]
    f0 = v_[i]
    f1 = v_[i + 1]
    dx = g_[1] - g_[0]
    a_rem = (s1 - c_[i]) / inv_norm       # un-normalized area into segment
    slope = (f1 - f0) / dx
    # (slope/2) x^2 + f0 x - a_rem = 0
    disc = jnp.sqrt(jnp.maximum(f0 * f0 + 2.0 * slope * a_rem, 0.0))
    x_lin = jnp.where(jnp.abs(slope) > 1e-9,
                      (disc - f0) / jnp.where(jnp.abs(slope) > 1e-9,
                                              slope, 1.0),
                      a_rem / jnp.maximum(f0, 1e-12))
    cos_theta = jnp.clip(c0 + x_lin, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = TWO_PI * s2
    from ..core.vec import coordinate_system
    d = -wi
    t1, t2 = coordinate_system(d)
    wo = (t1 * (sin_theta * jnp.cos(phi)) + t2 * (sin_theta * jnp.sin(phi))
          + d * cos_theta)
    return wo, tab_eval(cos_theta, grid, vals, inv_norm)


__all__ = ["Medium", "HomogeneousMedium", "HeterogeneousMedium",
           "PhaseFunction", "IsotropicPhase", "HGPhase", "RayleighPhase",
           "BlendPhase", "TabulatedPhase", "SGGXPhase",
           "hg_sample", "hg_eval", "rayleigh_eval", "rayleigh_sample",
           "tab_phase_tables", "tab_eval", "tab_sample", "PHASE_TAB",
           "sggx_sample", "sggx_eval", "sggx_sample_vndf", "sggx_ndf_pdf",
           "sggx_projected_area", "M_PHASE", "M_SGGX", "PHASE_SGGX",
           "N_MED_PARAMS", "M_SIGMA_T", "M_ALBEDO", "M_G", "M_MAXD",
           "M_GRID_OFF", "M_NX", "M_NY", "M_NZ", "M_FILTER", "M_SAMPLE_EM",
           "M_SGGX_OFF", "M_SGGX_NX", "M_SGGX_NY", "M_SGGX_NZ",
           "PHASE_ISOTROPIC", "PHASE_HG", "PHASE_RAYLEIGH"]
