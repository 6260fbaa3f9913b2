"""Reparameterized (warped-area) boundary gradients — VERDICT round-1
item 3. Acceptance: on a translating BLACK occluder in front of an area
emitter, the interior (detached-sampling) estimator gives ~0 gradient while
direct_reparam's warped-area estimator matches finite differences
(reference prb_reparam.py / reparam.py semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf


RES = 24
SPP = 96


def _scene(occ_x=0.0, integrator=None):
    integrator = integrator or {"type": "direct_reparam",
                                "reparam_rays": 16,
                                "reparam_kappa": 1e5}
    return mi.load_dict({
        "type": "scene",
        "integrator": integrator,
        "sensor": {"type": "perspective", "fov": 50,
                   "to_world": tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": RES, "height": RES,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent",
                               "sample_count": SPP}},
        # emissive rectangle facing the camera
        "lamp": {"type": "rectangle",
                 "to_world": tf.translate([0, 0, 2.0])
                 @ tf.rotate([0, 1, 0], 180) @ tf.scale([1.0, 1.0, 1.0]),
                 "emitter": {"type": "area",
                             "radiance": {"type": "rgb", "value": 5.0}}},
        # black occluder half-covering it
        "occ": {"type": "rectangle",
                "to_world": tf.translate([occ_x - 0.8, 0, 1.0])
                @ tf.rotate([0, 1, 0], 180) @ tf.scale([0.5, 0.9, 1.0]),
                "bsdf": {"type": "diffuse",
                         "reflectance": {"type": "rgb", "value": 0.0}}},
    })


def _occluder_rows(sa):
    """Static-triangle rows belonging to the occluder (the z~1 plane)."""
    v0z = np.asarray(sa.s_v0z)[:sa.n_static_tris]
    return np.abs(v0z - 1.0) < 0.1


def _img_sum(scene, seed):
    return float(np.asarray(mi.render(scene, seed=seed))[..., :3].sum())


def test_occluder_boundary_gradient_matches_fd():
    # ---- finite differences (same seed -> correlated estimate) ----------
    h = 0.03
    f_p = _img_sum(_scene(+h), seed=5)
    f_m = _img_sum(_scene(-h), seed=5)
    fd = (f_p - f_m) / (2 * h)
    assert abs(fd) > 1.0, f"setup broken: FD ~ 0 ({fd})"

    # ---- AD: forward-mode tangent = occluder x-translation --------------
    sc = _scene(0.0)
    sa = sc.compile()
    rows = _occluder_rows(sa)
    assert rows.sum() == 2
    tang = np.zeros_like(np.asarray(sa.s_v0x))
    tang[: sa.n_static_tris][rows] = 1.0     # d v0x / d delta = 1

    integ = sc.integrator
    dimg = integ.render_forward(sc, seed=5, spp=SPP,
                                tangents={"s_v0x": jnp.asarray(tang)})
    ad = float(np.asarray(dimg)[..., :3].sum())

    # ---- interior-only estimator: reparam disabled -> ~0 ----------------
    sc0 = _scene(0.0, integrator={"type": "direct_reparam",
                                  "reparam_max_depth": 0})
    integ0 = sc0.integrator
    dimg0 = integ0.render_forward(sc0, seed=5, spp=SPP,
                                  tangents={"s_v0x": jnp.asarray(tang)})
    interior = float(np.asarray(dimg0)[..., :3].sum())

    assert abs(interior) < 0.15 * abs(fd), (interior, fd)
    assert np.sign(ad) == np.sign(fd), (ad, fd)
    assert abs(ad - fd) < 0.45 * abs(fd), (ad, fd)


def test_reparam_primal_identical():
    """The reparameterization is the identity in primal mode: the
    direct_reparam render equals the plain direct render in expectation."""
    sc_r = _scene(0.0)
    img_r = np.asarray(mi.render(sc_r, seed=1, spp=64))[..., :3]
    sc_d = _scene(0.0, integrator={"type": "direct"})
    img_d = np.asarray(mi.render(sc_d, seed=1, spp=64))[..., :3]
    # different RNG consumption (aux draws) -> compare means
    assert abs(img_r.mean() - img_d.mean()) < 0.05 * max(img_d.mean(), 1e-9)


def test_prb_reparam_and_emission_reparam_construct():
    for t in ("prb_reparam", "emission_reparam"):
        sc = _scene(0.0, integrator={"type": t})
        img = np.asarray(mi.render(sc, seed=0, spp=8))
        assert np.isfinite(img).all()
        assert img[..., :3].sum() > 0


# ---------------------------------------------------------------------------
# General (non-translation) silhouette motion — VERDICT round-2 item 7.
# Sphere occluders exercise the exact-affine follow-shape path
# (ad/reparam.py): before round 3 the sphere follow was the translation
# column only, which zeroes ROTATION and SCALE silhouette gradients.
# Spheres also carry the smooth |dot(n,d)| boundary test, so the FD
# comparison is well-conditioned (a flat-shaded mesh rotating in its own
# plane is unbiased but extremely high-variance: the barycentric boundary
# proxy weights internal edges, which only matters when the warp varies
# across the surface).
# ---------------------------------------------------------------------------

def _scene_ellipsoid(angle_deg=0.0, scale=1.0, integrator=None):
    """Black anisotropically-scaled sphere (ellipsoid) occluder in front
    of the lamp; rotating it about the view axis reshapes its silhouette."""
    integrator = integrator or {"type": "direct_reparam",
                                "reparam_rays": 16,
                                "reparam_kappa": 1e5}
    return mi.load_dict({
        "type": "scene",
        "integrator": integrator,
        "sensor": {"type": "perspective", "fov": 50,
                   "to_world": tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": RES, "height": RES,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent",
                               "sample_count": SPP}},
        "lamp": {"type": "rectangle",
                 "to_world": tf.translate([0, 0, 2.0])
                 @ tf.rotate([0, 1, 0], 180) @ tf.scale([1.0, 1.0, 1.0]),
                 "emitter": {"type": "area",
                             "radiance": {"type": "rgb", "value": 5.0}}},
        "occ": {"type": "sphere",
                "to_world": tf.translate([-0.55, 0.25, 1.0])
                @ tf.rotate([0, 0, 1], angle_deg)
                @ tf.scale([0.4 * scale, 0.1 * scale, 0.2 * scale]),
                "bsdf": {"type": "diffuse",
                         "reflectance": {"type": "rgb", "value": 0.0}}},
    })


def _sph_matrix_tangent(build, h):
    """Numeric d(sph matrix)/d(param): exact for affine params, and free
    of row-layout / handedness conventions."""
    sp = build(+h).compile()
    sm = build(-h).compile()
    return ((np.asarray(sp.sph_m0c) - np.asarray(sm.sph_m0c)) / (2 * h),
            (np.asarray(sp.sph_m1c) - np.asarray(sm.sph_m1c)) / (2 * h))


def _fd_mean(build, h, seeds):
    fds = [(_img_sum(build(+h), seed=s) - _img_sum(build(-h), seed=s))
           / (2 * h) for s in seeds]
    return float(np.mean(fds))


def test_rotating_ellipsoid_gradient_matches_fd():
    build = lambda a: _scene_ellipsoid(angle_deg=float(np.degrees(a)))
    fd = _fd_mean(build, 0.05, range(4))
    assert abs(fd) > 0.5, f"setup broken: FD ~ 0 ({fd})"

    sc = build(0.0)
    dm0, dm1 = _sph_matrix_tangent(build, 1e-3)
    tangents = {"sph_m0c": jnp.asarray(dm0), "sph_m1c": jnp.asarray(dm1)}
    ads = [float(np.asarray(sc.integrator.render_forward(
        sc, seed=s, spp=SPP, tangents=tangents))[..., :3].sum())
        for s in (5, 11)]
    ad = float(np.mean(ads))
    assert np.sign(ad) == np.sign(fd), (ads, fd)
    assert abs(ad - fd) < 0.5 * abs(fd), (ads, fd)


def test_scaling_ellipsoid_gradient_matches_fd():
    """Uniform-scale silhouette gradient: identically ZERO under the old
    translation-only sphere follow."""
    build = lambda s: _scene_ellipsoid(scale=1.0 + s)
    fd = _fd_mean(build, 0.05, range(4))
    assert abs(fd) > 0.5, f"setup broken: FD ~ 0 ({fd})"

    sc = build(0.0)
    dm0, dm1 = _sph_matrix_tangent(build, 1e-3)
    tangents = {"sph_m0c": jnp.asarray(dm0), "sph_m1c": jnp.asarray(dm1)}
    ads = [float(np.asarray(sc.integrator.render_forward(
        sc, seed=s, spp=SPP, tangents=tangents))[..., :3].sum())
        for s in (5, 11)]
    ad = float(np.mean(ads))
    assert np.sign(ad) == np.sign(fd), (ads, fd)
    assert abs(ad - fd) < 0.5 * abs(fd), (ads, fd)
