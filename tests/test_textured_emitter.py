"""Textured area-emitter radiance (reference area.cpp nested-texture
radiance): hit evaluation, NEE/BSDF-sampling MIS consistency, and light
tracing all see the same spatially-varying emission."""

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf

CHECKER = {"type": "checkerboard",
           "color0": {"type": "rgb", "value": [0.0, 0.0, 0.0]},
           "color1": {"type": "rgb", "value": [8.0, 8.0, 8.0]}}


def _scene(integ, spp, light_facing_cam=False):
    if light_facing_cam:
        light_tf = tf.rotate([0, 1, 0], 180)       # facing -z (the camera)
    else:
        light_tf = (tf.translate([0, 2, 0]) @ tf.rotate([1, 0, 0], 90)
                    @ tf.scale([0.8, 0.8, 1]))
    d = {"type": "scene", "integrator": integ,
         "sensor": {"type": "perspective", "fov": 60,
                    "to_world": tf.look_at(
                        [0, 0, -3] if light_facing_cam else [0, 1.5, -3],
                        [0, 0, 0], [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 16, "height": 16,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": spp}},
         "light": {"type": "rectangle", "to_world": light_tf,
                   "emitter": {"type": "area", "radiance": dict(CHECKER)}}}
    if not light_facing_cam:
        d["floor"] = {"type": "rectangle",
                      "to_world": tf.rotate([1, 0, 0], -90)
                      @ tf.scale([3, 3, 1]),
                      "bsdf": {"type": "diffuse"}}
    return mi.load_dict(d)


def test_hit_eval_shows_texture():
    """Camera sees the emitter directly: the checker pattern appears (not
    its mean)."""
    img = np.asarray(mi.render(_scene({"type": "path", "max_depth": 2}, 16,
                                      light_facing_cam=True),
                               spp=16, seed=0))
    lum = img.sum(-1)
    bright = lum > 0.5 * lum.max()
    # a checker has both bright and dark texels across the face
    assert bright.any() and (~bright[2:-2, 2:-2]).any(), lum
    assert lum.max() > 20.0 and lum[2:-2, 2:-2].min() < 1.0


def test_nee_bsdf_strategies_agree():
    """NEE-only and BSDF-sampling-only direct illumination of a floor lit
    by the textured emitter agree in the mean — requires the NEE sampler
    to evaluate the texture at its sampled emitter points with the same
    uv convention as ray hits."""
    nee = np.asarray(mi.render(_scene(
        {"type": "direct", "emitter_samples": 4, "bsdf_samples": 0}, 128),
        spp=128, seed=0))
    bsf = np.asarray(mi.render(_scene(
        {"type": "direct", "emitter_samples": 0, "bsdf_samples": 4}, 512),
        spp=512, seed=0))
    r = bsf.sum() / nee.sum()
    assert abs(r - 1.0) < 0.1, (nee.sum(), bsf.sum(), r)


def test_ptracer_parity_textured_emitter():
    fw = np.asarray(mi.render(_scene({"type": "path", "max_depth": 3}, 128),
                              spp=128, seed=0))
    lt = np.asarray(mi.render(_scene({"type": "ptracer", "max_depth": 3},
                                     1024), spp=1024, seed=0))
    r = lt.sum() / fw.sum()
    assert abs(r - 1.0) < 0.12, (fw.sum(), lt.sum(), r)


def test_mesh_emitter_texture():
    """Textured radiance on a mesh-shape (cube) emitter: strategies agree
    (triangle-CDF sampling interpolates the sampled uv)."""
    def scene(integ, spp):
        return mi.load_dict({
            "type": "scene", "integrator": integ,
            "sensor": {"type": "perspective", "fov": 60,
                       "to_world": tf.look_at([0, 1.5, -3], [0, 0, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 12,
                                "height": 12, "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": spp}},
            "floor": {"type": "rectangle",
                      "to_world": tf.rotate([1, 0, 0], -90)
                      @ tf.scale([3, 3, 1]),
                      "bsdf": {"type": "diffuse"}},
            "light": {"type": "cube",
                      "to_world": tf.translate([0, 2, 0])
                      @ tf.scale([0.4, 0.4, 0.4]),
                      "emitter": {"type": "area",
                                  "radiance": dict(CHECKER)}}})
    nee = np.asarray(mi.render(scene(
        {"type": "direct", "emitter_samples": 4, "bsdf_samples": 0}, 128),
        spp=128, seed=0))
    bsf = np.asarray(mi.render(scene(
        {"type": "direct", "emitter_samples": 0, "bsdf_samples": 4}, 512),
        spp=512, seed=0))
    r = bsf.sum() / nee.sum()
    assert abs(r - 1.0) < 0.12, (nee.sum(), bsf.sum(), r)

def test_sphere_emitter_texture():
    """Textured radiance on an analytic-sphere emitter (sphere.cpp
    spherical-uv convention): NEE-only and BSDF-sampling-only direct
    illumination agree, and the direct view shows the pattern."""
    def scene(integ, spp, cam=(0, 1.5, -3)):
        return mi.load_dict({
            "type": "scene", "integrator": integ,
            "sensor": {"type": "perspective", "fov": 60,
                       "to_world": tf.look_at(list(cam), [0, 1.2, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 16,
                                "height": 16, "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": spp}},
            "floor": {"type": "rectangle",
                      "to_world": tf.rotate([1, 0, 0], -90)
                      @ tf.scale([3, 3, 1]),
                      "bsdf": {"type": "diffuse"}},
            "light": {"type": "sphere", "radius": 0.5,
                      "to_world": tf.translate([0, 1.8, 0]),
                      "emitter": {"type": "area",
                                  "radiance": dict(CHECKER)}}})
    # direct view: checker visible on the sphere (not the mean)
    img = np.asarray(mi.render(
        scene({"type": "path", "max_depth": 2}, 16, cam=(0, 1.8, -2)),
        spp=16, seed=0))
    lum = img.sum(-1)
    sphere_px = lum > 0.0
    assert sphere_px.any()
    vals = lum[sphere_px]
    assert vals.max() > 15.0 and vals.min() < 1.0, (vals.min(), vals.max())
    # MIS-strategy agreement on the lit floor
    nee = np.asarray(mi.render(scene(
        {"type": "direct", "emitter_samples": 4, "bsdf_samples": 0}, 128),
        spp=128, seed=0))
    bsf = np.asarray(mi.render(scene(
        {"type": "direct", "emitter_samples": 0, "bsdf_samples": 4}, 512),
        spp=512, seed=0))
    r = bsf.sum() / nee.sum()
    assert abs(r - 1.0) < 0.12, (nee.sum(), bsf.sum(), r)


def test_sphere_emitter_texture_ptracer_parity():
    def scene(integ, spp):
        return mi.load_dict({
            "type": "scene", "integrator": integ,
            "sensor": {"type": "perspective", "fov": 60,
                       "to_world": tf.look_at([0, 1.5, -3], [0, 0.5, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 12,
                                "height": 12, "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": spp}},
            "floor": {"type": "rectangle",
                      "to_world": tf.rotate([1, 0, 0], -90)
                      @ tf.scale([3, 3, 1]),
                      "bsdf": {"type": "diffuse"}},
            "light": {"type": "sphere", "radius": 0.4,
                      "to_world": tf.translate([0, 1.6, 0]),
                      "emitter": {"type": "area",
                                  "radiance": dict(CHECKER)}}})
    fw = np.asarray(mi.render(scene({"type": "path", "max_depth": 3}, 256),
                              spp=256, seed=0))
    lt = np.asarray(mi.render(scene({"type": "ptracer", "max_depth": 3},
                                    2048), spp=2048, seed=0))
    r = lt.sum() / fw.sum()
    assert abs(r - 1.0) < 0.12, (fw.sum(), lt.sum(), r)
