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


def _lens_scene(integ, spp, sensor_extra=None, ppx=0.0):
    sensor = {"type": "thinlens", "fov": 45,
              "aperture_radius": 0.25, "focus_distance": 3.0,
              "to_world": tf.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0]),
              "film": {"type": "hdrfilm", "width": 24, "height": 24,
                       "rfilter": {"type": "box"}},
              "sampler": {"type": "independent", "sample_count": spp}}
    if sensor_extra:
        sensor.update(sensor_extra)
    if ppx:
        sensor["principal_point_offset_x"] = ppx
    return mi.load_dict({
        "type": "scene", "integrator": integ, "sensor": sensor,
        # bright emitter sphere well OUT of focus (1.5 in front of the
        # focus plane) -> defocus disk on film
        "light": {"type": "sphere", "radius": 0.08,
                  "to_world": tf.translate([0, 0, -1.5]),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 50.0}}}})


def test_thinlens_ptracer_defocus_parity():
    """Light tracing through the thin lens reproduces both the energy and
    the defocus footprint of the camera-path render (the lens-point film
    mapping, reference thinlens.cpp sample_direction)."""
    fw = np.asarray(mi.render(_lens_scene(
        {"type": "path", "max_depth": 2}, 256), spp=256, seed=0))
    lt = np.asarray(mi.render(_lens_scene(
        {"type": "ptracer", "max_depth": 2}, 1024), spp=1024, seed=0))
    assert abs(lt.sum() / fw.sum() - 1.0) < 0.15, (lt.sum(), fw.sum())
    # footprint: pixels carrying >1% of the max — blur disks must match
    f_fw = (fw.sum(-1) > 0.01 * fw.sum(-1).max()).sum()
    f_lt = (lt.sum(-1) > 0.01 * lt.sum(-1).max()).sum()
    assert abs(f_lt - f_fw) <= max(6, 0.3 * f_fw), (f_fw, f_lt)
    # and it must actually be blurred: wider than the in-focus footprint
    fw_pin = np.asarray(mi.render(_lens_scene(
        {"type": "path", "max_depth": 2}, 256,
        sensor_extra={"aperture_radius": 1e-5}), spp=256, seed=0))
    f_pin = (fw_pin.sum(-1) > 0.01 * fw_pin.sum(-1).max()).sum()
    assert f_lt > 2 * f_pin, (f_lt, f_pin)


def test_ptracer_principal_point_offset():
    """The splat inverse mapping honors principal_point_offset (both
    integrators shift identically)."""
    def shift(integ, spp):
        base = np.asarray(mi.render(_lens_scene(integ, spp), spp=spp,
                                    seed=0))
        off = np.asarray(mi.render(_lens_scene(integ, spp, ppx=0.25),
                                   spp=spp, seed=0))
        cols = np.arange(base.shape[1])

        def centroid(img):
            prof = img.sum(axis=(0, 2))
            return (prof * cols).sum() / prof.sum()
        return centroid(off) - centroid(base)
    s_lt = shift({"type": "ptracer", "max_depth": 2}, 512)
    s_fw = shift({"type": "path", "max_depth": 2}, 128)
    assert abs(s_lt - s_fw) < 0.5, (s_lt, s_fw)
    assert abs(s_lt - (-6.0)) < 0.5, s_lt  # 0.25 * 24 px


def test_ptracer_rejects_unsupported_sensor():
    sc = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "ptracer", "max_depth": 2},
        "sensor": {"type": "radiancemeter",
                   "film": {"type": "hdrfilm", "width": 1, "height": 1},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "light": {"type": "constant"}})
    with pytest.raises(RuntimeError, match="ptracer.*sensor"):
        mi.render(sc, spp=4, seed=0)


def test_projector_emitter():
    _parity({"light": {"type": "projector",
                       "to_world": tf.look_at([0, 3, 0], [0, 0, 0],
                                              [0, 0, 1]),
                       "fov": 40.0,
                       "irradiance": {"type": "rgb", "value": 25.0}}})


def test_directionalarea_collimated_beam():
    """directionalarea is ptracer-only transport (reference
    directionalarea.cpp): the collimated beam deposits irradiance == L on
    the floor (exit radiance L*rho/pi), while a camera-path render sees
    nothing (eval == 0, NEE skips the delta direction)."""
    em = {"light": {"type": "rectangle",
                    "to_world": tf.translate([0, 2, 0])
                    @ tf.rotate([1, 0, 0], 90) @ tf.scale([0.5, 0.5, 1]),
                    "emitter": {"type": "directionalarea",
                                "radiance": {"type": "rgb", "value": 5.0}}}}
    lt = np.asarray(mi.render(_scene(
        em, {"type": "ptracer", "max_depth": 3}, 768), spp=768, seed=0))
    assert np.isfinite(lt).all()
    # brightest floor pixels (inside the beam) ~ L * rho / pi
    expect = 5.0 * 0.7 / np.pi
    bright = lt.sum(-1) / 3.0
    top = np.sort(bright.ravel())[-4:]
    assert abs(top.mean() / expect - 1.0) < 0.25, (top, expect)
    fw = np.asarray(mi.render(_scene(
        em, {"type": "path", "max_depth": 3}, 64), spp=64, seed=0))
    assert fw.sum() == 0.0


def test_orthographic_ptracer_parity():
    """Light tracing through an orthographic sensor matches the camera
    path (fixed-direction connections, 1/A_world importance — reference
    orthographic.cpp sample_direction)."""
    def scene(integ, spp):
        return mi.load_dict({
            "type": "scene", "integrator": integ,
            "sensor": {"type": "orthographic",
                       "to_world": tf.look_at([0, 1.5, -3], [0, 1.5, 0],
                                              [0, 1, 0]) @ tf.scale([2, 2, 1]),
                       "film": {"type": "hdrfilm", "width": 16,
                                "height": 16, "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": spp}},
            "wall": {"type": "rectangle",
                     "to_world": tf.translate([0, 1.5, 2])
                     @ tf.scale([3, 3, 1]),
                     "bsdf": {"type": "twosided",
                              "nested": {"type": "diffuse",
                                         "reflectance": {"type": "rgb",
                                                         "value": 0.6}}}},
            "light": {"type": "point",
                      "to_world": tf.translate([0, 1.5, -1]),
                      "intensity": {"type": "rgb", "value": 6.0}}})
    fw = np.asarray(mi.render(scene({"type": "path", "max_depth": 2}, 64),
                              spp=64, seed=0))
    lt = np.asarray(mi.render(scene({"type": "ptracer", "max_depth": 2},
                                    1024), spp=1024, seed=0))
    assert fw.sum() > 0 and np.isfinite(lt).all()
    assert abs(lt.sum() / fw.sum() - 1.0) < 0.12, (lt.sum(), fw.sum())
    # the wall's radial falloff must land in the same place: compare 4x4
    # block means (per-pixel splat noise at this spp is ~7%)
    bf = fw.sum(-1).reshape(4, 4, 4, 4).mean((1, 3))
    bl = lt.sum(-1).reshape(4, 4, 4, 4).mean((1, 3))
    assert np.abs(bl / bf - 1.0).max() < 0.1, (bf, bl)
