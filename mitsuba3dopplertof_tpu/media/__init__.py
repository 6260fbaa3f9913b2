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
import jax.numpy as jnp

from ..core.properties import Properties, register_plugin
from ..core.vec import Vec3, dot, normalize
from ..core.math import PI, TWO_PI

PHASE_ISOTROPIC = 0
PHASE_HG = 1
PHASE_RAYLEIGH = 2

N_MED_PARAMS = 13
M_SIGMA_T = 0    # rgb extinction (heterogeneous: gray majorant-free base)
M_ALBEDO = 3     # rgb single-scattering albedo
M_G = 6          # HG asymmetry
M_SCALE = 7
M_MAXD = 8       # heterogeneous: majorant sigma_t = scale * max(grid); 0 = homogeneous
M_GRID_OFF = 9   # heterogeneous: offset into the flat grid atlas
M_NX = 10        # grid resolution
M_NY = 11
M_NZ = 12


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
    """reference src/phase/tabphase.cpp — v1 reduces to its mean cosine."""

    def __init__(self, props: Properties):
        super().__init__(props)
        vals = props.get("values", [1.0])
        if isinstance(vals, str):
            vals = [float(x) for x in vals.replace(",", " ").split()]
        v = np.asarray(vals, np.float64)
        cos = np.linspace(-1, 1, len(v))
        self.g = float((v * cos).sum() / max(v.sum(), 1e-9))
        self.type_id = PHASE_HG if abs(self.g) > 1e-4 else PHASE_ISOTROPIC


@register_plugin("phase", "sggx")
class SGGXPhase(PhaseFunction):
    """reference src/phase/sggx.cpp — anisotropic microflakes; v1 falls back
    to isotropic with a warning."""

    def __init__(self, props: Properties):
        super().__init__(props)
        for k in list(props.keys()):
            props.mark_queried(k)
        warnings.warn("sggx phase: falling back to isotropic in v1")


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
        props.get_bool("sample_emitters", True)

    def params_row(self):
        p = np.zeros(N_MED_PARAMS)
        p[M_SIGMA_T:M_SIGMA_T + 3] = self.sigma_t
        p[M_ALBEDO:M_ALBEDO + 3] = self.albedo
        p[M_G] = getattr(self.phase, "g", 0.0)
        p[M_SCALE] = self.scale
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


def rayleigh_eval(cos_theta):
    return 3.0 / (16.0 * PI) * (1.0 + cos_theta * cos_theta)


__all__ = ["Medium", "HomogeneousMedium", "HeterogeneousMedium",
           "PhaseFunction", "IsotropicPhase", "HGPhase", "RayleighPhase",
           "BlendPhase", "TabulatedPhase", "SGGXPhase",
           "hg_sample", "hg_eval", "rayleigh_eval",
           "N_MED_PARAMS", "M_SIGMA_T", "M_ALBEDO", "M_G", "M_MAXD",
           "M_GRID_OFF", "M_NX", "M_NY", "M_NZ",
           "PHASE_ISOTROPIC", "PHASE_HG", "PHASE_RAYLEIGH"]
