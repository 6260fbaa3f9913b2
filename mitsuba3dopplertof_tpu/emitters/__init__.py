"""Emitter plugins + TPU-side sampling.

Reference inventory: src/emitters/{point,area,constant,envmap,directional,
spot,projector,directionalarea}.cpp. Device-side sampling follows the masked
type-dispatch pattern (see bsdfs/__init__.py) over an emitter parameter
table; scene-level uniform emitter selection replicates
reference src/render/scene.cpp:170-188 (sample_emitter) exactly, including
the sample-reuse rescaling.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core.properties import Properties, register_plugin
from ..core.math import dot, normalize, PI
from ..render.types import DirectionSample

EMITTER_POINT = 0
EMITTER_AREA_RECT = 1     # area emitter on a rectangle shape
EMITTER_CONSTANT = 2
EMITTER_AREA_MESH = 3     # area emitter on an arbitrary mesh (CDF-sampled)
EMITTER_DIRECTIONAL = 4
EMITTER_SPOT = 5

N_EMITTER_PARAMS = 16
# param columns
E_POS = 0          # point: position / directional: direction
E_INTENSITY = 3    # point: rgb intensity / area: rgb radiance / constant: rgb
E_AREA = 6         # area: total world-space surface area
E_CUTOFF = 7       # spot: cos cutoff
E_BEAM = 8         # spot: cos beam width


def _get_rgb(props, key, default):
    v = props.get(key, default)
    if isinstance(v, dict):
        v = v.get("value")
    a = np.asarray(v, dtype=np.float64).reshape(-1)
    if a.size == 1:
        a = np.repeat(a, 3)
    return a[:3]


class Emitter:
    type_id = EMITTER_POINT
    is_environment = False
    delta = True

    def __init__(self, props: Properties):
        self.id = props.id
        self.shape = None       # set for area emitters during assembly
        self.inst_index = -1    # instance index of the host shape

    def params_row(self) -> np.ndarray:
        return np.zeros(N_EMITTER_PARAMS)


@register_plugin("emitter", "point")
class PointEmitter(Emitter):
    """reference src/emitters/point.cpp — intensity / dist^2, delta."""
    type_id = EMITTER_POINT
    delta = True

    def __init__(self, props: Properties):
        super().__init__(props)
        if props.has_property("position"):
            self.position = props.get_vector("position")
        else:
            m = props.get_transform("to_world", np.eye(4))
            self.position = m[:3, 3]
        self.intensity = _get_rgb(props, "intensity", [1.0, 1.0, 1.0])

    def params_row(self):
        p = np.zeros(N_EMITTER_PARAMS)
        p[E_POS:E_POS + 3] = self.position
        p[E_INTENSITY:E_INTENSITY + 3] = self.intensity
        return p


@register_plugin("emitter", "area")
class AreaEmitter(Emitter):
    """reference src/emitters/area.cpp — radiance over the host shape."""
    type_id = EMITTER_AREA_RECT
    delta = False

    def __init__(self, props: Properties):
        super().__init__(props)
        self.radiance = _get_rgb(props, "radiance", [1.0, 1.0, 1.0])

    def params_row(self):
        p = np.zeros(N_EMITTER_PARAMS)
        p[E_INTENSITY:E_INTENSITY + 3] = self.radiance
        return p


@register_plugin("emitter", "constant")
class ConstantEmitter(Emitter):
    """reference src/emitters/constant.cpp — uniform environment radiance."""
    type_id = EMITTER_CONSTANT
    is_environment = True
    delta = False

    def __init__(self, props: Properties):
        super().__init__(props)
        self.radiance = _get_rgb(props, "radiance", [1.0, 1.0, 1.0])

    def params_row(self):
        p = np.zeros(N_EMITTER_PARAMS)
        p[E_INTENSITY:E_INTENSITY + 3] = self.radiance
        return p


# ---------------------------------------------------------------------------
# Device-side sampling (operates on the compiled emitter tables in SceneData)
# ---------------------------------------------------------------------------

def sample_emitter_index(n_emitters: int, sample_x):
    """reference scene.cpp:170-188 — uniform pick + sample reuse."""
    if n_emitters == 1:
        return jnp.zeros(sample_x.shape, dtype=jnp.int32), jnp.float32(1.0), sample_x
    scaled = sample_x * float(n_emitters)
    index = jnp.minimum(scaled.astype(jnp.int32), n_emitters - 1)
    return index, jnp.float32(n_emitters), scaled - index.astype(scaled.dtype)


def sample_direction(scene_data, ref_p, ref_time, sample) -> "tuple":
    """Emitter sample_direction over the table, masked multi-type.

    Returns (DirectionSample, spec (N,3)) BEFORE visibility testing; the pdf
    already includes the discrete emitter-selection probability.
    """
    e_params = scene_data.emitter_params      # (E, P) jnp
    e_to_world = scene_data.emitter_to_world  # (E, 4, 4) jnp
    n = ref_p.shape[0]
    n_emitters = int(scene_data.n_emitters)
    dtype = ref_p.dtype

    if n_emitters == 0:
        zero3 = jnp.zeros((n, 3), dtype)
        z = jnp.zeros((n,), dtype)
        ds = DirectionSample(zero3, zero3, zero3, z, z, z > 1.0,
                             jnp.full((n,), -1, jnp.int32), jnp.zeros((n, 2), dtype))
        return ds, zero3

    index, emitter_weight, sample_x_re = sample_emitter_index(
        n_emitters, sample[:, 0])
    sample = jnp.stack([sample_x_re, sample[:, 1]], axis=-1)

    lane_params = e_params[index]            # (N, P)
    lane_m = e_to_world[index]               # (N, 4, 4)
    types_present = list(scene_data.emitter_types_present)
    lane_type = scene_data.emitter_type[index]

    best = None
    for tid in types_present:
        if tid == EMITTER_POINT:
            p = lane_params[:, E_POS:E_POS + 3]
            d = p - ref_p
            dist2 = jnp.maximum(dot(d, d), 1e-20)
            inv_dist = 1.0 / jnp.sqrt(dist2)
            dist = dist2 * inv_dist
            dirn = d * inv_dist[:, None]
            spec = lane_params[:, E_INTENSITY:E_INTENSITY + 3] * (inv_dist * inv_dist)[:, None]
            ds = DirectionSample(
                p, jnp.zeros_like(p), dirn, dist,
                jnp.ones((n,), dtype), jnp.ones((n,), bool),
                index, jnp.zeros((n, 2), dtype))
        elif tid == EMITTER_AREA_RECT:
            # uniform point on the rect: local (2u-1, 2v-1, 0)
            local = jnp.stack([2.0 * sample[:, 0] - 1.0,
                               2.0 * sample[:, 1] - 1.0,
                               jnp.zeros((n,), dtype)], axis=-1)
            p = (lane_m[:, :3, :3] @ local[..., None])[..., 0] + lane_m[:, :3, 3]
            nrm = normalize(jnp.cross(lane_m[:, :3, 0], lane_m[:, :3, 1]))
            d = p - ref_p
            dist2 = dot(d, d)
            dist = jnp.sqrt(dist2)
            dirn = d / jnp.maximum(dist[:, None], 1e-20)
            area = lane_params[:, E_AREA]
            cos_theta = -dot(dirn, nrm)
            # one-sided emission: pdf valid only from the front
            pdf = jnp.where(cos_theta > 1e-6,
                            dist2 / (jnp.abs(cos_theta) * area), 0.0)
            spec = jnp.where(
                (pdf > 0.0)[:, None],
                lane_params[:, E_INTENSITY:E_INTENSITY + 3]
                / jnp.maximum(pdf, 1e-20)[:, None], 0.0)
            ds = DirectionSample(
                p, nrm, dirn, dist, pdf, jnp.zeros((n,), bool),
                index, sample)
        elif tid == EMITTER_CONSTANT:
            from ..core import warp as _warp
            dirn = _warp.square_to_uniform_sphere(sample)
            radius = jnp.asarray(scene_data.bsphere_radius, dtype)
            dist = 2.0 * radius
            p = ref_p + dirn * dist[..., None]
            pdf = jnp.full((n,), 1.0 / (4.0 * np.pi), dtype)
            spec = lane_params[:, E_INTENSITY:E_INTENSITY + 3] * (4.0 * np.pi)
            ds = DirectionSample(
                p, -dirn, dirn, dist, pdf, jnp.zeros((n,), bool),
                index, sample)
        else:
            raise NotImplementedError(f"Emitter type {tid} NEE not implemented")

        if best is None:
            best = (ds, spec)
        else:
            m = lane_type == tid
            mf = m[:, None]
            pds, pspec = best
            best = (DirectionSample(
                jnp.where(mf, ds.p, pds.p), jnp.where(mf, ds.n, pds.n),
                jnp.where(mf, ds.d, pds.d), jnp.where(m, ds.dist, pds.dist),
                jnp.where(m, ds.pdf, pds.pdf), jnp.where(m, ds.delta, pds.delta),
                jnp.where(m, ds.emitter, pds.emitter),
                jnp.where(mf, ds.uv, pds.uv)),
                jnp.where(mf, spec, pspec))

    ds, spec = best
    # discrete selection probability (reference scene.cpp:259-263); with a
    # single emitter the reference's inlined path leaves pdf/spec untouched
    if n_emitters > 1:
        ds = ds._replace(pdf=ds.pdf * (1.0 / float(n_emitters)))
        spec = spec * float(n_emitters)
    return ds, spec


def pdf_direction(scene_data, si_prev_p, ds: DirectionSample):
    """pdf of sampling direction ds via NEE — for MIS on emitter hits
    (reference scene.cpp:296-303 pdf_emitter_direction). Delta emitters
    return 0."""
    n_emitters = int(scene_data.n_emitters)
    if n_emitters == 0:
        return jnp.zeros(ds.dist.shape, ds.dist.dtype)
    lane_type = scene_data.emitter_type[jnp.maximum(ds.emitter, 0)]
    lane_params = scene_data.emitter_params[jnp.maximum(ds.emitter, 0)]
    pdf = jnp.zeros(ds.dist.shape, ds.dist.dtype)
    for tid in list(scene_data.emitter_types_present):
        if tid in (EMITTER_AREA_RECT, EMITTER_AREA_MESH):
            area = lane_params[:, E_AREA]
            dist2 = ds.dist * ds.dist
            cos_theta = -dot(ds.d, ds.n)
            p = jnp.where(cos_theta > 1e-6,
                          dist2 / (jnp.abs(cos_theta) * jnp.maximum(area, 1e-20)),
                          0.0)
        elif tid == EMITTER_CONSTANT:
            p = jnp.full(ds.dist.shape, 1.0 / (4.0 * np.pi), ds.dist.dtype)
        else:  # delta emitters
            p = jnp.zeros(ds.dist.shape, ds.dist.dtype)
        pdf = jnp.where(lane_type == tid, p, pdf)
    pdf = jnp.where(ds.emitter >= 0, pdf, 0.0)
    return pdf * (1.0 / float(n_emitters))


def eval_emitter_hit(scene_data, si_n, si_wi_world_neg, lane_emitter):
    """Radiance of an emitter hit by a ray (reference area.cpp eval:82-90):
    area emitters emit radiance from the front side only."""
    e_params = scene_data.emitter_params
    lane_params = e_params[jnp.maximum(lane_emitter, 0)]
    rad = lane_params[:, E_INTENSITY:E_INTENSITY + 3]
    front = dot(si_n, si_wi_world_neg) > 0.0
    hit_area = lane_emitter >= 0
    return jnp.where((hit_area & front)[:, None], rad, 0.0)


__all__ = [
    "Emitter", "PointEmitter", "AreaEmitter", "ConstantEmitter",
    "sample_emitter_index", "sample_direction", "pdf_direction",
    "eval_emitter_hit", "N_EMITTER_PARAMS",
    "EMITTER_POINT", "EMITTER_AREA_RECT", "EMITTER_CONSTANT",
    "E_POS", "E_INTENSITY", "E_AREA",
]
