"""BSDF plugins and the TPU-native dispatch.

The reference dispatches BSDFs through Dr.Jit vcalls over a pointer registry
(reference include/mitsuba/render/bsdf.h:266, used at
src/integrators/dopplertofpath.cpp:210). The TPU equivalent: each BSDF
instance compiles to one row of a parameter table (type id + f32 params);
``eval_pdf_sample`` evaluates every type *present in the scene* over the full
wavefront and blends with masks — with <=4 distinct types per scene this is
pure VPU work that XLA fuses into the bounce loop, with no divergence.

All directions are in the local shading frame (z = normal), matching the
reference's convention.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core.properties import Properties, register_plugin
from ..core.math import INV_PI
from ..core import warp

# type ids (table column 0)
BSDF_DIFFUSE = 0
BSDF_NULL = 1
BSDF_CONDUCTOR = 2
BSDF_DIELECTRIC = 3
BSDF_ROUGHCONDUCTOR = 4
BSDF_PLASTIC = 5
BSDF_ROUGHPLASTIC = 6
BSDF_ROUGHDIELECTRIC = 7
BSDF_THINDIELECTRIC = 8
BSDF_BLEND = 9
BSDF_MASK = 10

N_BSDF_PARAMS = 16
# param columns (meaning depends on type; diffuse uses 0:3 + TWOSIDED)
P_REFL = 0            # rgb reflectance / specular reflectance
P_TWOSIDED = 3        # 1.0 if wrapped in `twosided`
P_ETA = 4             # ior / eta (dielectric); rgb eta (conductor 4:7)
P_K = 7               # rgb k (conductor 7:10)
P_ALPHA = 10          # roughness alpha
P_SPEC_TRANS = 11     # rgb transmittance 11:14 (dielectric)

# lobe flags (static per row, mirrors reference BSDFFlags)
FLAG_SMOOTH = 1       # has a smooth (non-delta) lobe => NEE applies
FLAG_DELTA = 2        # sampling may return a delta lobe
FLAG_NULL = 4         # null transmission lobe


class BSDF:
    """Host-side plugin base: compiles to (type_id, flags, params row)."""
    type_id = BSDF_DIFFUSE
    flags = FLAG_SMOOTH

    def __init__(self, props: Properties):
        self.id = props.id
        self.two_sided = False

    def params_row(self) -> np.ndarray:
        return np.zeros(N_BSDF_PARAMS, dtype=np.float64)


def _get_rgb(props, key, default):
    v = props.get(key, default)
    if isinstance(v, dict):   # {'type':'rgb','value':[...]} from the parser
        v = v.get("value")
    a = np.asarray(v, dtype=np.float64).reshape(-1)
    if a.size == 1:
        a = np.repeat(a, 3)
    return a[:3]


@register_plugin("bsdf", "diffuse")
class Diffuse(BSDF):
    """Lambertian (reference src/bsdfs/diffuse.cpp)."""
    type_id = BSDF_DIFFUSE
    flags = FLAG_SMOOTH

    def __init__(self, props: Properties):
        super().__init__(props)
        self.reflectance = _get_rgb(props, "reflectance", [0.5, 0.5, 0.5])

    def params_row(self):
        p = np.zeros(N_BSDF_PARAMS)
        p[P_REFL:P_REFL + 3] = self.reflectance
        p[P_TWOSIDED] = 1.0 if self.two_sided else 0.0
        return p


@register_plugin("bsdf", "twosided")
class TwoSided(BSDF):
    """Adapter making the nested BSDF two-sided
    (reference src/bsdfs/twosided.cpp). Compiles to the nested row with the
    TWOSIDED flag set rather than a separate dispatch case."""

    def __init__(self, props: Properties):
        super().__init__(props)
        nested = None
        for key, v in props.objects():
            if isinstance(v, BSDF):
                nested = v
        if nested is None:
            raise RuntimeError("twosided: requires a nested BSDF")
        self.nested = nested
        self.nested.two_sided = True
        self.type_id = nested.type_id
        self.flags = nested.flags
        self.two_sided = True

    def params_row(self):
        row = self.nested.params_row()
        row[P_TWOSIDED] = 1.0
        return row


@register_plugin("bsdf", "null")
class Null(BSDF):
    """Pass-through (reference src/bsdfs/null.cpp)."""
    type_id = BSDF_NULL
    flags = FLAG_NULL | FLAG_DELTA

    def __init__(self, props: Properties):
        super().__init__(props)

    def params_row(self):
        return np.zeros(N_BSDF_PARAMS)


# ---------------------------------------------------------------------------
# Device-side dispatch (component-wise: directions are Vec3, colors are Vec3)
# ---------------------------------------------------------------------------

from ..core.vec import Vec3, where3  # noqa: E402


class BSDFSampleResult(NamedTuple):
    val_nee: Vec3             # f(wi, wo_nee) * cos(wo_nee)   (rgb)
    pdf_nee: jnp.ndarray      # (N,)
    wo: Vec3                  # sampled direction (local)
    weight: Vec3              # f*cos/pdf for the sampled direction (rgb)
    pdf: jnp.ndarray          # (N,)
    eta: jnp.ndarray          # (N,)
    sampled_delta: jnp.ndarray  # (N,) bool
    sampled_null: jnp.ndarray   # (N,) bool


def _diffuse_eval_pdf_sample(param, wi: Vec3, wo_nee: Vec3, s1, s2x, s2y):
    """Reference src/bsdfs/diffuse.cpp eval/pdf/sample; `s1` is drawn by the
    caller but unused (lobe selection only matters for multi-lobe types).
    ``param(j)``: per-lane (N,) column accessor."""
    refl = Vec3(param(P_REFL), param(P_REFL + 1), param(P_REFL + 2))
    two_sided = param(P_TWOSIDED) > 0.5
    sgn = jnp.where(two_sided & (wi.z < 0.0), -1.0, 1.0)
    cos_i = wi.z * sgn
    cos_o_nee = wo_nee.z * sgn

    front = (cos_i > 0.0) & (cos_o_nee > 0.0)
    fcos = jnp.where(front, INV_PI * cos_o_nee, 0.0)
    val_nee = refl * fcos
    pdf_nee = fcos

    wo_local = warp.cosine_hemisphere_c(s2x, s2y)
    ok = cos_i > 0.0
    pdf = jnp.where(ok, INV_PI * wo_local.z, 0.0)
    wo = Vec3(wo_local.x, wo_local.y, wo_local.z * sgn)
    zero = jnp.zeros_like(pdf)
    weight = where3(ok, refl, Vec3(zero, zero, zero))
    false_ = zero > 1.0
    return BSDFSampleResult(val_nee, pdf_nee, wo, weight, pdf,
                            jnp.ones_like(pdf), false_, false_)


def _null_eval_pdf_sample(param, wi: Vec3, wo_nee: Vec3, s1, s2x, s2y):
    z = jnp.zeros_like(wi.z)
    ones = jnp.ones_like(wi.z)
    true_ = ones > 0.0
    return BSDFSampleResult(
        Vec3(z, z, z), z, -wi, Vec3(ones, ones, ones), ones,
        ones, true_, true_)


_DISPATCH = {
    BSDF_DIFFUSE: _diffuse_eval_pdf_sample,
    BSDF_NULL: _null_eval_pdf_sample,
}


def eval_pdf_sample(sa, lane_bsdf, wi: Vec3, wo_nee: Vec3,
                    s1, s2x, s2y) -> BSDFSampleResult:
    """Masked multi-type dispatch of BSDF::eval_pdf_sample
    (reference src/render/bsdf.cpp:168). Evaluates each type present in the
    scene over the whole wavefront and mask-selects — pure fused VPU work,
    the TPU equivalent of the reference's vcall over the BSDFPtr registry.
    """
    lane_type = sa.bsdf_type[lane_bsdf]

    def param(j):
        return sa.bsdf_params[j, lane_bsdf]

    result = None
    for tid in sa.bsdf_types_present:
        fn = _DISPATCH.get(int(tid))
        if fn is None:
            raise NotImplementedError(f"BSDF type id {tid} not implemented")
        r = fn(param, wi, wo_nee, s1, s2x, s2y)
        if result is None:
            result = r
        else:
            m = lane_type == tid
            result = BSDFSampleResult(
                where3(m, r.val_nee, result.val_nee),
                jnp.where(m, r.pdf_nee, result.pdf_nee),
                where3(m, r.wo, result.wo),
                where3(m, r.weight, result.weight),
                jnp.where(m, r.pdf, result.pdf),
                jnp.where(m, r.eta, result.eta),
                jnp.where(m, r.sampled_delta, result.sampled_delta),
                jnp.where(m, r.sampled_null, result.sampled_null),
            )
    return result


__all__ = [
    "BSDF", "Diffuse", "TwoSided", "Null", "BSDFSampleResult",
    "eval_pdf_sample", "N_BSDF_PARAMS",
    "FLAG_SMOOTH", "FLAG_DELTA", "FLAG_NULL",
    "BSDF_DIFFUSE", "BSDF_NULL",
]
