"""ptracer emitter-type coverage: light tracing must agree with path
tracing in the mean for every emitter kind (unbiasedness of the adjoint
estimator, reference ptracer.cpp sample_emitter_ray /
sample_visible_emitters). Each scene is a diffuse floor lit by one
emitter; images are compared by total energy."""

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf


def _scene(emitter_dict, integ, spp, extra=None):
    d = {"type": "scene",
         "integrator": integ,
         "sensor": {"type": "perspective", "fov": 60,
                    "to_world": tf.look_at([0, 1.5, -3], [0, 0, 0],
                                           [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 16, "height": 16,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": spp}},
         "floor": {"type": "rectangle",
                   "to_world": tf.rotate([1, 0, 0], -90)
                   @ tf.scale([3, 3, 1]),
                   "bsdf": {"type": "diffuse",
                            "reflectance": {"type": "rgb",
                                            "value": [0.7, 0.7, 0.7]}}}}
    d.update(emitter_dict)
    if extra:
        d.update(extra)
    return mi.load_dict(d)


def _parity(emitter_dict, rel=0.12, spp_fw=96, spp_lt=512, depth=3,
            extra=None):
    fw = np.asarray(mi.render(_scene(
        emitter_dict, {"type": "path", "max_depth": depth}, spp_fw,
        extra), spp=spp_fw, seed=0))
    lt = np.asarray(mi.render(_scene(
        emitter_dict, {"type": "ptracer", "max_depth": depth}, spp_lt,
        extra), spp=spp_lt, seed=0))
    assert np.isfinite(fw).all() and np.isfinite(lt).all()
    assert fw.sum() > 0 and lt.sum() > 0
    r = lt.sum() / fw.sum()
    assert abs(r - 1.0) < rel, (lt.sum(), fw.sum(), r)
    return fw, lt


def test_sphere_area_emitter():
    _parity({"light": {"type": "sphere", "radius": 0.3,
                       "to_world": tf.translate([0, 2, 0]),
                       "emitter": {"type": "area",
                                   "radiance": {"type": "rgb",
                                                "value": 10.0}}}})


def test_mesh_area_emitter():
    # cube area emitter above the floor (triangle-CDF sampling path)
    _parity({"light": {"type": "cube",
                       "to_world": tf.translate([0, 2, 0])
                       @ tf.scale([0.3, 0.3, 0.3]),
                       "emitter": {"type": "area",
                                   "radiance": {"type": "rgb",
                                                "value": 6.0}}}})


def test_spot_emitter():
    _parity({"light": {"type": "spot",
                       "to_world": tf.look_at([0, 3, 0], [0, 0, 0],
                                              [0, 0, 1]),
                       "cutoff_angle": 35.0, "beam_width": 20.0,
                       "intensity": {"type": "rgb", "value": 30.0}}})


def test_directional_emitter():
    _parity({"light": {"type": "directional",
                       "direction": [0.2, -1.0, 0.3],
                       "irradiance": {"type": "rgb", "value": 3.0}}})


def test_constant_emitter():
    _parity({"light": {"type": "constant",
                       "radiance": {"type": "rgb", "value": 0.8}}},
            rel=0.15, depth=3)


def test_envmap_emitter():
    # procedural 2x4 envmap via the radiance fallback
    _parity({"light": {"type": "envmap",
                       "radiance": {"type": "rgb", "value": 0.8},
                       "scale": 1.0}}, rel=0.15, depth=3)


def test_sphere_emitter_directly_visible():
    """The emitter->sensor connection reproduces the directly-seen sphere
    (compare center-region brightness, path vs ptracer)."""
    em = {"light": {"type": "sphere", "radius": 0.5,
                    "to_world": tf.translate([0, 1.2, 0]),
                    "emitter": {"type": "area",
                                "radiance": {"type": "rgb", "value": 4.0}}}}
    fw, lt = _parity(em, rel=0.12)
    # the bright emitter footprint must appear in the same place with the
    # same radiance (argmax alone is noise within the uniform footprint)
    mask = fw.sum(-1) > 0.5 * fw.sum(-1).max()
    assert mask.sum() >= 3
    ratio = lt.sum(-1)[mask].mean() / fw.sum(-1)[mask].mean()
    assert abs(ratio - 1.0) < 0.2, ratio


def test_hide_emitters_removes_direct_term_only():
    em = {"light": {"type": "sphere", "radius": 0.5,
                    "to_world": tf.translate([0, 1.2, 0]),
                    "emitter": {"type": "area",
                                "radiance": {"type": "rgb", "value": 4.0}}}}
    vis = np.asarray(mi.render(_scene(
        em, {"type": "ptracer", "max_depth": 3}, 256), spp=256, seed=0))
    hid = np.asarray(mi.render(_scene(
        em, {"type": "ptracer", "max_depth": 3, "hide_emitters": True},
        256), spp=256, seed=0))
    assert hid.sum() < vis.sum() * 0.9
    assert hid.sum() > 0  # indirect floor lighting remains
