"""Depolarizing-scene fast path (round 5): when every BSDF is an exact
depolarizer (diffuse/null) and no Rayleigh phase is present, the
polarized variant skips the Mueller chain — its S0 film must equal BOTH
the scalar rgb render (bitwise: same draws, same arithmetic) and the
full Mueller path (MI_NO_DEPOL_FASTPATH=1), because one
ideal-depolarizer bounce zeroes S1..S3 and S0 then follows the scalar
estimator term-for-term."""

import numpy as np

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf


def _scene(bsdf):
    return mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "floor": {"type": "rectangle",
                  "to_world": tf.translate([0, -1.0, 0])
                  @ tf.rotate([1, 0, 0], -90) @ tf.scale([4, 4, 1]),
                  "bsdf": bsdf},
        "light": {"type": "point", "position": [0, 3, -3],
                  "intensity": {"type": "rgb", "value": 30.0}},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": tf.look_at([0, 0.5, -3], [0, 0, 0],
                                          [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 24, "height": 16},
                   "sampler": {"type": "independent", "sample_count": 8}},
    })


DIFF = {"type": "twosided", "nested": {"type": "diffuse"}}


def test_depolarizing_scene_matches_rgb_and_full_mueller(monkeypatch):
    old = mi.variant()
    try:
        mi.set_variant("tpu_rgb")
        rgb = np.asarray(mi.render(_scene(DIFF), seed=2, spp=8))
        mi.set_variant("tpu_rgb_polarized")
        fast = np.asarray(mi.render(_scene(DIFF), seed=2, spp=8))
        monkeypatch.setenv("MI_NO_DEPOL_FASTPATH", "1")
        full = np.asarray(mi.render(_scene(DIFF), seed=2, spp=8))
        monkeypatch.delenv("MI_NO_DEPOL_FASTPATH")
        assert np.array_equal(fast, rgb)
        assert np.abs(fast - full).max() < 1e-6
    finally:
        mi.set_variant(old)


def test_polarizing_scene_keeps_full_path():
    """A conductor polarizes: the gate must NOT engage (sanity: the
    detection is by BSDF type set)."""
    from mitsuba3dopplertof_tpu.integrators import _scene_depolarizing
    sc = _scene({"type": "conductor"})
    assert not _scene_depolarizing(sc.compile())
    sc2 = _scene(DIFF)
    assert _scene_depolarizing(sc2.compile())
