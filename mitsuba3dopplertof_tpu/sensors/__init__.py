"""Sensor plugins.

Reference inventory: src/sensors/{perspective,thinlens,orthographic,
radiancemeter,irradiancemeter,distant,batch}.cpp. The perspective camera
reproduces the exact sample->ray mapping of reference
src/sensors/perspective.cpp:200-236 + include/mitsuba/render/sensor.h:227
(perspective_projection), so generated camera rays match the reference
bit-for-bit given the same position samples.

The shutter window doubles as the ToF exposure interval
(reference src/render/sensor.cpp:15-19).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core.properties import Properties, register_plugin, create_plugin
from ..core.vec import Vec3, normalize
from ..render.types import Ray


def parse_fov(props: Properties, aspect: float) -> float:
    """reference src/render/sensor.cpp parse_fov — returns x-fov in degrees."""
    if props.has_property("fov"):
        fov = props.get_float("fov")
        axis = props.get_string("fov_axis", "x")
        if axis == "x":
            return fov
        conv = lambda v, f: math.degrees(
            2.0 * math.atan(math.tan(math.radians(v) * 0.5) * f))
        if axis == "y":
            return conv(fov, aspect)
        if axis == "diagonal":
            d = math.hypot(1.0, 1.0 / aspect)
            return conv(fov, 1.0 / d)
        if axis == "smaller":
            return fov if aspect <= 1.0 else conv(fov, aspect)
        if axis == "larger":
            return fov if aspect >= 1.0 else conv(fov, aspect)
        raise RuntimeError(f"Unknown fov_axis '{axis}'")
    focal = props.get_float("focal_length", 50.0)
    # 35mm full-frame diagonal ~ 43.27mm
    value = math.degrees(2.0 * math.atan(43.266615300557 / (2.0 * focal)))
    d = math.hypot(1.0, 1.0 / aspect)
    return math.degrees(2.0 * math.atan(math.tan(math.radians(value) * 0.5) / d))


class Sensor:
    def __init__(self, props: Properties):
        self.id = props.id
        self.to_world = props.get_transform("to_world", np.eye(4))
        self.shutter_open = props.get_float("shutter_open", 0.0)
        self.shutter_close = props.get_float("shutter_close", self.shutter_open)
        self.film = None
        self.sampler = None
        self.medium = None
        from ..films import Film
        from ..samplers import Sampler
        from ..media import Medium
        for key, v in props.objects():
            if isinstance(v, Film):
                self.film = v
            elif isinstance(v, Sampler):
                self.sampler = v
            elif isinstance(v, Medium):
                self.medium = v
        if self.film is None:
            from ..films import HDRFilm
            self.film = HDRFilm(Properties("hdrfilm"))
        if self.sampler is None:
            from ..samplers import IndependentSampler
            self.sampler = IndependentSampler(Properties("independent"))

    @property
    def shutter_open_time(self) -> float:
        return self.shutter_close - self.shutter_open

    @property
    def needs_aperture_sample(self) -> bool:
        return False


class SensorParams(NamedTuple):
    """Device-side camera constants. The matrix is 12 python floats (static
    closure constants — broadcasting against (N,) lanes costs nothing)."""
    m: tuple                    # 12-tuple row-major 3x4 world matrix
    tan_half_x: float
    tan_half_y: float
    near_clip: float
    far_clip: float
    kind: int = 0               # 0 perspective, 1 thinlens, 2 ortho/distant,
                                # 3 radiancemeter, 4/5 irradiancemeter
    pp_ox: float = 0.0          # principal point offset, film-size units
    pp_oy: float = 0.0          # (reference perspective.cpp:191-205)


@register_plugin("sensor", "perspective")
class PerspectiveSensor(Sensor):
    def __init__(self, props: Properties):
        super().__init__(props)
        self.near_clip = props.get_float("near_clip", 1e-2)
        self.far_clip = props.get_float("far_clip", 1e4)
        # ProjectiveCamera base property (reference sensor.cpp:196): a
        # pinhole ignores it, but scene dicts (e.g. cornell_box) set it
        self.focus_distance = props.get_float("focus_distance", 0.0)
        size = self.film.size
        aspect = size[0] / size[1]
        self.x_fov = parse_fov(props, aspect)
        self.aspect = aspect
        self.pp_offset = (props.get_float("principal_point_offset_x", 0.0),
                          props.get_float("principal_point_offset_y", 0.0))

    def device_params(self) -> SensorParams:
        th = math.tan(math.radians(self.x_fov) * 0.5)
        m = tuple(float(self.to_world[i, j]) for i in range(3) for j in range(4))
        return SensorParams(
            m=m,
            tan_half_x=float(th),
            tan_half_y=float(th / self.aspect),
            near_clip=float(self.near_clip),
            far_clip=float(self.far_clip),
            kind=0,
            pp_ox=float(self.pp_offset[0]),
            pp_oy=float(self.pp_offset[1]))


def sample_ray(params: SensorParams, time, sx, sy, ap_x, ap_y):
    """Generate camera rays from film-plane samples in [0,1]^2 (each an (N,)
    array — component-wise layout, see core/vec.py).

    Derivation from reference perspective.cpp:217-236 with the
    perspective_projection of sensor.h:227: the camera-space direction for a
    film sample (sx, sy) is
        d_cam ∝ ((1-2*sx)*tan(x_fov/2), (1-2*sy)*tan(x_fov/2)/aspect, 1)
    normalized, then rotated to world; the origin advances to the near plane.
    Returns (Ray, weight (scalar 1.0 — pinhole)).
    """
    dcx = (1.0 - 2.0 * (sx + params.pp_ox)) * params.tan_half_x
    dcy = (1.0 - 2.0 * (sy + params.pp_oy)) * params.tan_half_y
    d_cam = normalize(Vec3(dcx, dcy, jnp.ones_like(sx)))
    m = params.m
    d = Vec3(m[0] * d_cam.x + m[1] * d_cam.y + m[2] * d_cam.z,
             m[4] * d_cam.x + m[5] * d_cam.y + m[6] * d_cam.z,
             m[8] * d_cam.x + m[9] * d_cam.y + m[10] * d_cam.z)
    inv_z = 1.0 / d_cam.z
    near_t = params.near_clip * inv_z
    far_t = params.far_clip * inv_z
    o = Vec3(m[3] + d.x * near_t, m[7] + d.y * near_t, m[11] + d.z * near_t)
    maxt = far_t - near_t
    return Ray(o, d, time, maxt), 1.0


__all__ = ["Sensor", "PerspectiveSensor", "SensorParams", "sample_ray",
           "parse_fov"]


@register_plugin("sensor", "thinlens")
class ThinLensSensor(PerspectiveSensor):
    """Perspective camera with a thin-lens aperture
    (reference src/sensors/thinlens.cpp): depth of field via aperture disk
    sampling and focus-plane ray construction."""

    def __init__(self, props: Properties):
        self.aperture_radius = props.get_float("aperture_radius", 0.1)
        self.focus_distance = props.get_float("focus_distance", 10.0)
        super().__init__(props)

    @property
    def needs_aperture_sample(self) -> bool:
        return True

    def device_params(self) -> SensorParams:
        p = super().device_params()
        return p._replace(kind=1)

    def device_lens_params(self):
        return float(self.aperture_radius), float(self.focus_distance)


@register_plugin("sensor", "orthographic")
class OrthographicSensor(Sensor):
    """reference src/sensors/orthographic.cpp — parallel rays along +Z in
    camera space; film plane extent comes from the to_world scale."""

    def __init__(self, props: Properties):
        super().__init__(props)
        self.near_clip = props.get_float("near_clip", 1e-2)
        self.far_clip = props.get_float("far_clip", 1e4)

    def device_params(self) -> SensorParams:
        m = tuple(float(self.to_world[i, j]) for i in range(3) for j in range(4))
        return SensorParams(m=m, tan_half_x=1.0, tan_half_y=1.0,
                            near_clip=float(self.near_clip),
                            far_clip=float(self.far_clip), kind=2)


@register_plugin("sensor", "radiancemeter")
class RadianceMeter(Sensor):
    """reference src/sensors/radiancemeter.cpp — measures radiance along a
    single ray (origin +Z of to_world); film is typically 1x1."""

    def __init__(self, props: Properties):
        super().__init__(props)

    def device_params(self) -> SensorParams:
        m = tuple(float(self.to_world[i, j]) for i in range(3) for j in range(4))
        return SensorParams(m=m, tan_half_x=0.0, tan_half_y=0.0,
                            near_clip=0.0, far_clip=1e4, kind=3)


class BatchParams(NamedTuple):
    """Batch sensor: K children rendered side by side (reference
    src/sensors/batch.cpp) — column k of the film belongs to child k."""
    children: tuple          # of (SensorParams, lens-or-None)


def sample_ray_kind(params, lens, time, sx, sy, ap_x, ap_y):
    """Dispatch over static sensor kind. ``lens`` = (aperture_radius,
    focus_distance) for thinlens, else None."""
    if isinstance(params, BatchParams):
        from ..core.vec import where3
        K = len(params.children)
        u = jnp.clip(sx * K, 0.0, K - 1e-4)
        child = jnp.floor(u)
        lx = u - child
        ray = weight = None
        for k, (cp, cl) in enumerate(params.children):
            r_k, w_k = sample_ray_kind(cp, cl, time, lx, sy, ap_x, ap_y)
            w_k = w_k * jnp.ones_like(sx)
            if ray is None:
                ray, weight = r_k, w_k
            else:
                m = child == k
                ray = Ray(where3(m, r_k.o, ray.o), where3(m, r_k.d, ray.d),
                          time, jnp.where(m, r_k.maxt, ray.maxt))
                weight = jnp.where(m, w_k, weight)
        return ray, weight
    if params.kind == 0:
        return sample_ray(params, time, sx, sy, ap_x, ap_y)
    m = params.m
    n = sx.shape[0]
    if params.kind == 1:      # thinlens (reference thinlens.cpp:sample_ray)
        aperture_radius, focus_distance = lens
        from ..core.warp import disk_concentric_c
        dcx = (1.0 - 2.0 * (sx + params.pp_ox)) * params.tan_half_x
        dcy = (1.0 - 2.0 * (sy + params.pp_oy)) * params.tan_half_y
        d_cam = normalize(Vec3(dcx, dcy, jnp.ones_like(sx)))
        px, py = disk_concentric_c(ap_x, ap_y)
        px = px * aperture_radius
        py = py * aperture_radius
        # focus-plane intersection of the central ray
        ft = focus_distance / d_cam.z
        fx = d_cam.x * ft
        fy = d_cam.y * ft
        fz = jnp.full_like(fx, focus_distance)
        d2 = normalize(Vec3(fx - px, fy - py, fz))
        o_cam = Vec3(px, py, jnp.zeros_like(px))
        d = Vec3(m[0] * d2.x + m[1] * d2.y + m[2] * d2.z,
                 m[4] * d2.x + m[5] * d2.y + m[6] * d2.z,
                 m[8] * d2.x + m[9] * d2.y + m[10] * d2.z)
        o = Vec3(m[0] * o_cam.x + m[1] * o_cam.y + m[2] * o_cam.z + m[3],
                 m[4] * o_cam.x + m[5] * o_cam.y + m[6] * o_cam.z + m[7],
                 m[8] * o_cam.x + m[9] * o_cam.y + m[10] * o_cam.z + m[11])
        inv_z = 1.0 / d2.z
        near_t = params.near_clip * inv_z
        far_t = params.far_clip * inv_z
        o = o + d * near_t
        return Ray(o, d, time, far_t - near_t), 1.0
    if params.kind == 2:      # orthographic
        ox = 1.0 - 2.0 * sx
        oy = 1.0 - 2.0 * sy
        o_cam = Vec3(ox, oy, jnp.zeros_like(ox))
        z = jnp.zeros_like(ox)
        one = jnp.ones_like(ox)
        d = Vec3(m[2] * one, m[6] * one, m[10] * one)
        o = Vec3(m[0] * o_cam.x + m[1] * o_cam.y + m[3],
                 m[4] * o_cam.x + m[5] * o_cam.y + m[7],
                 m[8] * o_cam.x + m[9] * o_cam.y + m[11])
        o = o + d * params.near_clip
        return Ray(o, d, time,
                   jnp.full_like(ox, params.far_clip - params.near_clip)), 1.0
    if params.kind == 5:      # irradiancemeter bound to a shape
        from ..core.warp import cosine_hemisphere_c
        if params.tan_half_x > 0.5:      # sphere: uniform surface point
            z = 1.0 - 2.0 * sx
            r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
            phi = 2.0 * np.pi * sy
            lp = Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)
            ln = lp
        else:                            # rectangle [-1,1]^2, normal +z
            lp = Vec3(1.0 - 2.0 * sx, 1.0 - 2.0 * sy, jnp.zeros_like(sx))
            ln = Vec3(jnp.zeros_like(sx), jnp.zeros_like(sx),
                      jnp.ones_like(sx))
        o = Vec3(m[0] * lp.x + m[1] * lp.y + m[2] * lp.z + m[3],
                 m[4] * lp.x + m[5] * lp.y + m[6] * lp.z + m[7],
                 m[8] * lp.x + m[9] * lp.y + m[10] * lp.z + m[11])
        nw = normalize(Vec3(m[0] * ln.x + m[1] * ln.y + m[2] * ln.z,
                            m[4] * ln.x + m[5] * ln.y + m[6] * ln.z,
                            m[8] * ln.x + m[9] * ln.y + m[10] * ln.z))
        from ..core.vec import coordinate_system
        t1, t2 = coordinate_system(nw)
        dl = cosine_hemisphere_c(ap_x, ap_y)
        d = t1 * dl.x + t2 * dl.y + nw * dl.z
        o = o + nw * 1e-4
        return (Ray(o, d, time, jnp.full_like(sx, params.far_clip)),
                float(np.pi))
    # radiancemeter: constant ray
    one = jnp.ones_like(sx)
    d = Vec3(m[2] * one, m[6] * one, m[10] * one)
    o = Vec3(m[3] * one, m[7] * one, m[11] * one)
    return Ray(o, d, time, jnp.full_like(sx, params.far_clip)), 1.0


@register_plugin("sensor", "irradiancemeter")
class IrradianceMeter(Sensor):
    """reference src/sensors/irradiancemeter.cpp — measures irradiance over
    the shape it is attached to: positions uniform over the surface,
    directions cosine-weighted about the normal, ray weight pi (the
    cosine-sampling estimator of E = integral L cos dw). Binds to
    rectangle (exact) and sphere shapes; unbound meters fall back to a
    point meter at the to_world origin."""

    def __init__(self, props: Properties):
        super().__init__(props)
        self.shape = None            # bound by the owning shape at load

    def device_params(self) -> SensorParams:
        kind = 4
        mat = self.to_world
        tanx = 0.0
        if self.shape is not None:
            m0, _, _, _ = self.shape.to_world.matrices()
            mat = np.asarray(m0)
            kind = 5
            tanx = 1.0 if getattr(self.shape, "is_analytic_sphere",
                                  False) else 0.0
        m = tuple(float(mat[i, j]) for i in range(3) for j in range(4))
        return SensorParams(m=m, tan_half_x=tanx, tan_half_y=0.0,
                            near_clip=0.0, far_clip=1e4, kind=kind)


@register_plugin("sensor", "distant")
class DistantSensor(Sensor):
    """reference src/sensors/distant.cpp — orthographic-like directional
    sensor covering the scene from a direction."""

    def __init__(self, props: Properties):
        super().__init__(props)
        if props.has_property("direction"):
            import numpy as np
            d = np.asarray(props.get_vector("direction"))
            d = d / np.linalg.norm(d)
            # build a frame: to_world rotation columns (s, t, d)
            s = np.cross([0, 1, 0] if abs(d[1]) < 0.9 else [1, 0, 0], d)
            s = s / np.linalg.norm(s)
            t = np.cross(d, s)
            m = np.eye(4)
            m[:3, 0], m[:3, 1], m[:3, 2] = s, t, d
            self.to_world = m

    def device_params(self) -> SensorParams:
        m = tuple(float(self.to_world[i, j]) for i in range(3) for j in range(4))
        return SensorParams(m=m, tan_half_x=1.0, tan_half_y=1.0,
                            near_clip=0.0, far_clip=1e4, kind=2)


@register_plugin("sensor", "batch")
class BatchSensor(Sensor):
    """reference src/sensors/batch.cpp — renders several nested sensors side
    by side. v1: stores children; `sensors` property exposes them and the
    first child drives device params."""

    def __init__(self, props: Properties):
        super().__init__(props)
        self.children = [v for _, v in props.objects() if isinstance(v, Sensor)]
        if not self.children:
            raise RuntimeError("batch: needs nested sensors")
        first = self.children[0]
        self.film = self.film or first.film
        self.sampler = self.sampler or first.sampler

    def device_params(self):
        return BatchParams(children=tuple(
            (c.device_params(),
             c.device_lens_params() if hasattr(c, "device_lens_params")
             else None)
            for c in self.children))
