"""tpu_rgb_polarized variant: Mueller-calculus transport + the stokes
integrator (reference mueller.h, stokes.cpp, polarizer.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import mueller as mu
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.core.vec import Vec3


@pytest.fixture(autouse=True)
def _restore_variant():
    yield
    mi.set_variant("tpu_rgb")


# ---------------------------------------------------------------------------
# unit level
# ---------------------------------------------------------------------------

def test_malus_chain():
    n = 3
    z = jnp.zeros(n)
    o = jnp.ones(n)
    S = (Vec3(o, o, o), Vec3(z, z, z), Vec3(z, z, z), Vec3(z, z, z))
    for dt in (0.0, np.pi / 6, np.pi / 4, np.pi / 2):
        P1 = mu.rotated_element(z, mu.linear_polarizer(1.0, like=z))
        P2 = mu.rotated_element(jnp.full(n, dt),
                                mu.linear_polarizer(1.0, like=z))
        out = mu.mm_apply_stokes(mu.mm_mul(P2, P1), S)
        assert abs(float(out[0].x[0]) - 0.5 * np.cos(dt) ** 2) < 1e-6


def test_fresnel_polarized_matches_scalar():
    from mitsuba3dopplertof_tpu.core.fresnel import (fresnel_dielectric,
                                                     fresnel_conductor)
    n = 2
    z = jnp.zeros(n)
    ci = jnp.full(n, np.cos(np.deg2rad(50.0)))
    a_s, a_p, _, _, _ = mu.fresnel_polarized(ci, jnp.full(n, 1.5), z)
    F = fresnel_dielectric(ci, 1.5)[0]
    avg = 0.5 * (mu._c_abs2(a_s) + mu._c_abs2(a_p))
    assert abs(float(avg[0]) - float(F[0])) < 1e-6
    # conductor Mueller (0,0) element == scalar fresnel_conductor
    M = mu.specular_reflection_mueller(
        ci, (jnp.full(n, 0.2),) * 3, (jnp.full(n, 3.9),) * 3)
    fc = fresnel_conductor(ci, jnp.full(n, 0.2), jnp.full(n, 3.9))
    assert abs(float(M[0].x[0]) - float(np.asarray(fc)[0])) < 1e-5


def test_brewster_angle():
    n = 2
    cb = jnp.full(n, np.cos(np.arctan(1.5)))
    _, a_p, _, _, _ = mu.fresnel_polarized(cb, jnp.full(n, 1.5),
                                           jnp.zeros(n))
    assert float(mu._c_abs2(a_p)[0]) < 1e-10


def test_quarter_wave_plate():
    n = 2
    z = jnp.zeros(n)
    o = jnp.ones(n)
    S45 = (Vec3(o, o, o), Vec3(z, z, z), Vec3(o, o, o), Vec3(z, z, z))
    out = mu.mm_apply_stokes(mu.linear_retarder(jnp.full(n, np.pi / 2)), S45)
    assert abs(abs(float(out[3].x[0])) - 1.0) < 1e-5
    assert abs(float(out[1].x[0])) < 1e-5


# ---------------------------------------------------------------------------
# render level
# ---------------------------------------------------------------------------

def _plate_scene(plates, spp=32):
    d = {
        "type": "scene",
        "emitter": {"type": "constant",
                    "radiance": {"type": "rgb", "value": 1.0}},
        "sensor": {"type": "perspective", "fov": 10,
                   "to_world": tf.look_at([0, 0, -2], [0, 0, 1], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 2, "height": 2},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "integrator": {"type": "stokes",
                       "nested": {"type": "path", "max_depth": 8}},
    }
    for i, (bsdf, zpos) in enumerate(plates):
        d[f"p{i}"] = {"type": "rectangle",
                      "to_world": tf.translate([0, 0, zpos]), "bsdf": bsdf}
    return mi.load_dict(d)


def _stokes(img):
    # channels: rgb(3) + 12 aovs (S0..S3 x RGB)
    return [img[..., 3 + i * 3: 6 + i * 3].mean(axis=-1) for i in range(4)]


def test_render_malus_law():
    """Two ideal polarizers: S0 = 0.5 cos^2(dtheta), crossed -> 0
    (end-to-end through the stokes integrator)."""
    mi.set_variant("tpu_rgb_polarized")
    for t1, t2, expect in ((0.0, 0.0, 0.5), (0.0, 45.0, 0.25),
                           (0.0, 90.0, 0.0)):
        sc = _plate_scene([({"type": "polarizer", "theta": t1}, 2.0),
                           ({"type": "polarizer", "theta": t2}, 1.0)])
        img = np.asarray(sc.integrator.render(sc, seed=0, spp=16))
        assert abs(img[..., :3].mean() - expect) < 1e-3, (t1, t2)


def test_render_dop_behind_polarizer():
    mi.set_variant("tpu_rgb_polarized")
    sc = _plate_scene([({"type": "polarizer", "theta": 0.0}, 2.0)])
    img = np.asarray(sc.integrator.render(sc, seed=0, spp=16))
    S = _stokes(img)
    dop = np.sqrt(S[1] ** 2 + S[2] ** 2 + S[3] ** 2) / np.maximum(S[0], 1e-9)
    assert np.all(np.abs(dop - 1.0) < 1e-4)
    assert np.all(np.abs(S[3]) < 1e-4)      # linear, no circular component


def test_render_circular_from_qwp():
    """Polarizer then quarter-wave retarder at 45 deg -> circular light
    (|S3| = S0)."""
    mi.set_variant("tpu_rgb_polarized")
    sc = _plate_scene([({"type": "polarizer", "theta": 0.0}, 2.0),
                       ({"type": "retarder", "theta": 45.0, "delta": 90.0},
                        1.0)])
    img = np.asarray(sc.integrator.render(sc, seed=0, spp=16))
    S = _stokes(img)
    circ = np.abs(S[3]) / np.maximum(S[0], 1e-9)
    assert np.all(circ > 0.99), circ


def test_polarized_s0_matches_scalar():
    """On an all-diffuse scene the Mueller transport's S0 equals the scalar
    render bit-for-bit (depolarizer bounces only touch column 0)."""
    integ = {"type": "path", "max_depth": 4}
    mi.set_variant("tpu_rgb_polarized")
    sp = mi.load_file("/root/reference/configs_example/scene.xml",
                      resx=8, resy=8)
    a = np.asarray(mi.load_dict(integ).render(sp, seed=0, spp=16))
    mi.set_variant("tpu_rgb")
    sr = mi.load_file("/root/reference/configs_example/scene.xml",
                      resx=8, resy=8)
    b = np.asarray(mi.load_dict(integ).render(sr, seed=0, spp=16))
    assert np.abs(a[..., :3] - b[..., :3]).max() < 1e-5


def test_stokes_requires_polarized_variant():
    mi.set_variant("tpu_rgb")
    sc = _plate_scene([({"type": "polarizer", "theta": 0.0}, 2.0)])
    with pytest.raises(RuntimeError, match="polarized"):
        sc.integrator.render(sc, seed=0, spp=4)


def test_roughconductor_polarizes():
    """Rough copper reflecting an unpolarized environment acquires partial
    linear polarization (exact Fresnel Mueller at the micro-normal,
    roughconductor.cpp polarized branch); copper's |b/a| grows from red to
    blue, so S1 must too."""
    mi.set_variant("tpu_rgb_polarized")
    sc = mi.load_dict({
        "type": "scene",
        "plate": {"type": "rectangle",
                  "bsdf": {"type": "roughconductor", "alpha": 0.2,
                           "distribution": "ggx", "material": "Cu"}},
        "env": {"type": "constant", "radiance": {"type": "rgb", "value": 1.0}},
        "sensor": {"type": "perspective", "fov": 30,
                   "to_world": tf.look_at([0, 2.5, 2.5], [0, 0, 0],
                                          [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 64}},
        "integrator": {"type": "stokes",
                       "nested": {"type": "path", "max_depth": 3}},
    })
    img = np.asarray(sc.integrator.render(sc, seed=0, spp=128))
    c = slice(3, 5)
    S0 = img[c, c, 3:6].mean(axis=(0, 1))
    S1 = img[c, c, 6:9].mean(axis=(0, 1))
    frac = S1 / np.maximum(S0, 1e-9)
    assert frac[2] > frac[1] > frac[0] > 0.0, frac     # b > g > r > 0
    assert frac[2] > 0.05


def test_ptracer_polarized_s0_diffuse():
    """Light tracing under tpu_rgb_polarized: scalar transport equals the
    polarized path tracer's S0 through depolarizing (diffuse) chains
    (exact there; polarizing specular chains are documented approximate,
    integrators/ptracer.py docstring)."""
    import numpy as np
    from mitsuba3dopplertof_tpu.core import transform as tf
    mi.set_variant("tpu_rgb_polarized")
    try:
        d = {"type": "scene",
             "sensor": {"type": "perspective", "fov": 60,
                        "to_world": tf.look_at([0, 1.5, -3], [0, 0, 0],
                                               [0, 1, 0]),
                        "film": {"type": "hdrfilm", "width": 12,
                                 "height": 12, "rfilter": {"type": "box"}},
                        "sampler": {"type": "independent",
                                    "sample_count": 64}},
             "floor": {"type": "rectangle",
                       "to_world": tf.rotate([1, 0, 0], -90)
                       @ tf.scale([3, 3, 1]),
                       "bsdf": {"type": "diffuse"}},
             "light": {"type": "sphere", "radius": 0.3,
                       "to_world": tf.translate([0, 2, 0]),
                       "emitter": {"type": "area",
                                   "radiance": {"type": "rgb",
                                                "value": 10.0}}}}
        d["integrator"] = {"type": "ptracer", "max_depth": 3}
        lt = np.asarray(mi.render(mi.load_dict(d), spp=64, seed=0))
        d["integrator"] = {"type": "path", "max_depth": 3}
        fw = np.asarray(mi.render(mi.load_dict(d), spp=64, seed=0))
        assert abs(lt.sum() / fw.sum() - 1.0) < 0.1, (lt.sum(), fw.sum())
    finally:
        mi.set_variant("tpu_rgb")


def _malus_scene(integ, thetas, spp):
    """Area emitter -> polarizer plates (one per theta) -> diffuse floor,
    camera on the floor. Light tracing transports Stokes through the
    plates; the camera path reaches the emitter only by BSDF sampling
    (plates block NEE shadow rays)."""
    import numpy as np
    from mitsuba3dopplertof_tpu.core import transform as tf
    d = {"type": "scene", "integrator": integ,
         "sensor": {"type": "perspective", "fov": 50,
                    "to_world": tf.look_at([0, 1.2, -2.5], [0, 0, 0],
                                           [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 10, "height": 10,
                             "rfilter": {"type": "box"}},
                    "sampler": {"type": "independent",
                                "sample_count": spp}},
         "floor": {"type": "rectangle",
                   "to_world": tf.rotate([1, 0, 0], -90)
                   @ tf.scale([1.5, 1.5, 1]),
                   "bsdf": {"type": "diffuse",
                            "reflectance": {"type": "rgb", "value": 0.8}}},
         "light": {"type": "rectangle",
                   "to_world": tf.translate([0, 3.0, 0])
                   @ tf.rotate([1, 0, 0], 90) @ tf.scale([1.5, 1.5, 1]),
                   "emitter": {"type": "area",
                               "radiance": {"type": "rgb", "value": 12.0}}}}
    for i, th in enumerate(thetas):
        d[f"plate{i}"] = {
            "type": "rectangle",
            "to_world": tf.translate([0, 1.4 + 0.3 * i, 0])
            @ tf.rotate([1, 0, 0], 90) @ tf.scale([2.0, 2.0, 1]),
            "bsdf": {"type": "polarizer", "theta": float(th)}}
    return mi.load_dict(d)


def test_ptracer_mueller_malus_law():
    """Two stacked linear polarizers: transmitted power follows Malus's
    law (cos^2 of the relative angle) — the scalar S0 approximation would
    be angle-independent. Light tracing must match both the analytic
    ratio and the polarized camera path."""
    import numpy as np
    mi.set_variant("tpu_rgb_polarized")
    try:
        def lt(thetas, spp=1024):
            return np.asarray(mi.render(_malus_scene(
                {"type": "ptracer", "max_depth": 6}, thetas, spp),
                spp=spp, seed=0)).sum()

        base = lt([0.0])                      # one plate: angle-free
        par = lt([0.0, 0.0])                  # parallel pair
        deg60 = lt([0.0, 60.0])               # cos^2 60 = 0.25
        crossed = lt([0.0, 90.0])
        assert abs(par / base - 1.0) < 0.15, (base, par)
        assert abs(deg60 / par - 0.25) < 0.08, deg60 / par
        assert crossed < 0.05 * par, (crossed, par)

        # cross-check against the camera path (pure BSDF sampling reaches
        # the emitter through the delta plates; NEE is blocked -> MIS
        # keeps it unbiased)
        fw = np.asarray(mi.render(_malus_scene(
            {"type": "path", "max_depth": 6}, [0.0, 60.0], 512),
            spp=512, seed=0)).sum()
        assert abs(deg60 / fw - 1.0) < 0.2, (deg60, fw)
    finally:
        mi.set_variant("tpu_rgb")


def test_volpath_stokes_s0_matches_scalar():
    """stokes{volpath}: on a depolarizing scene (diffuse + medium) the S0
    channel equals the scalar volpath render (M00 chains reproduce the
    scalar weights exactly)."""
    import numpy as np
    from mitsuba3dopplertof_tpu.core import transform as tf
    mi.set_variant("tpu_rgb_polarized")
    try:
        def scene(integ):
            return mi.load_dict({
                "type": "scene", "integrator": integ,
                "sensor": {"type": "perspective", "fov": 45,
                           "to_world": tf.look_at([0, 0.5, -4], [0, 0, 0],
                                                  [0, 1, 0]),
                           "film": {"type": "hdrfilm", "width": 8,
                                    "height": 8, "rfilter": {"type": "box"}},
                           "sampler": {"type": "independent",
                                       "sample_count": 32}},
                "medium_box": {"type": "cube", "to_world": tf.scale([1.2] * 3),
                               "bsdf": {"type": "null"},
                               "interior": {"type": "homogeneous",
                                            "sigma_t": {"type": "rgb",
                                                        "value": 1.0},
                                            "albedo": {"type": "rgb",
                                                       "value": 0.7}}},
                "floor": {"type": "rectangle",
                          "to_world": tf.translate([0, -1.5, 0])
                          @ tf.rotate([1, 0, 0], -90) @ tf.scale([6, 6, 1]),
                          "bsdf": {"type": "diffuse"}},
                "light": {"type": "point", "position": [0, 4, -4],
                          "intensity": {"type": "rgb", "value": 40.0}}})
        scalar = np.asarray(mi.render(scene({"type": "volpath",
                                             "max_depth": 6}), spp=32,
                                      seed=0))
        st = np.asarray(mi.render(scene(
            {"type": "stokes", "nested": {"type": "volpath",
                                          "max_depth": 6}}), spp=32, seed=0))
        assert st.shape[-1] >= 15            # rgb + 12 stokes AOVs
        assert np.allclose(st[..., :3], scalar[..., :3], atol=2e-5), \
            np.abs(st[..., :3] - scalar[..., :3]).max()
        # fully depolarizing scene: S1..S3 vanish
        assert np.abs(st[..., 6:]).max() < 1e-5
    finally:
        mi.set_variant("tpu_rgb")


def test_volpath_stokes_medium_preserves_dop():
    """Polarization survives attenuation: a conductor floor seen through a
    non-scattering absorbing medium keeps its degree of polarization
    (S1/S0 invariant as sigma_t scales both)."""
    import numpy as np
    from mitsuba3dopplertof_tpu.core import transform as tf
    mi.set_variant("tpu_rgb_polarized")
    try:
        def scene(sig):
            return mi.load_dict({
                "type": "scene",
                "integrator": {"type": "stokes",
                               "nested": {"type": "volpath",
                                          "max_depth": 4}},
                "sensor": {"type": "perspective", "fov": 45,
                           "to_world": tf.look_at([0, 1.8, -3], [0, 0, 0],
                                                  [0, 1, 0]),
                           "film": {"type": "hdrfilm", "width": 8,
                                    "height": 8, "rfilter": {"type": "box"}},
                           "sampler": {"type": "independent",
                                       "sample_count": 64}},
                "medium_box": {"type": "cube",
                               "to_world": tf.scale([2.5, 2.5, 2.5]),
                               "bsdf": {"type": "null"},
                               "interior": {"type": "homogeneous",
                                            "sigma_t": {"type": "rgb",
                                                        "value": sig},
                                            "albedo": {"type": "rgb",
                                                       "value": 0.0}}},
                "floor": {"type": "rectangle",
                          "to_world": tf.rotate([1, 0, 0], -90)
                          @ tf.scale([3, 3, 1]),
                          "bsdf": {"type": "roughconductor",
                                   "alpha": 0.15,
                                   "eta": {"type": "rgb",
                                           "value": [0.2, 0.9, 1.4]},
                                   "k": {"type": "rgb",
                                         "value": [3.9, 2.5, 2.1]}}},
                "light": {"type": "point", "position": [2.5, 4, -3],
                          "intensity": {"type": "rgb", "value": 60.0}}})
        def dop(img):
            s0 = img[..., 3:6].sum(-1)
            s1 = img[..., 6:9].sum(-1)
            s2 = img[..., 9:12].sum(-1)
            m = s0 > 0.3 * s0.max()
            lp = np.sqrt(s1 ** 2 + s2 ** 2)
            return (lp[m] / s0[m]).mean(), s0.sum()
        d0, e0 = dop(np.asarray(mi.render(scene(0.0), spp=64, seed=0)))
        d1, e1 = dop(np.asarray(mi.render(scene(0.4), spp=64, seed=0)))
        assert e1 < 0.8 * e0                      # attenuation happened
        assert d0 > 0.01                          # polarizing reflection
        assert abs(d1 - d0) < 0.25 * d0 + 0.005, (d0, d1)
    finally:
        mi.set_variant("tpu_rgb")


def test_rayleigh_scatter_mueller_analytic():
    """90-degree Rayleigh scattering of unpolarized light is fully
    linearly polarized perpendicular to the scattering plane; forward
    scattering leaves the state untouched (Chandrasekhar)."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba3dopplertof_tpu.integrators.polarized import (
        rayleigh_scatter_mueller)
    from mitsuba3dopplertof_tpu.core.vec import Vec3
    from mitsuba3dopplertof_tpu.core import mueller as mu

    def v(x, y, z):
        return Vec3(jnp.full((1,), float(x)), jnp.full((1,), float(y)),
                    jnp.full((1,), float(z)))
    # 90 degrees: in +z, out +x
    M = rayleigh_scatter_mueller(v(0, 0, 1), v(1, 0, 0))
    S = mu.mm_apply_stokes(M, (v(1, 1, 1), v(0, 0, 0), v(0, 0, 0),
                               v(0, 0, 0)))
    s0, s1, s2, s3 = (float(np.asarray(s.x)[0]) for s in S)
    assert abs(s0 - 1.0) < 1e-6                 # M00 normalized
    dop = np.sqrt(s1 * s1 + s2 * s2 + s3 * s3) / s0
    assert abs(dop - 1.0) < 1e-6, dop           # fully polarized
    # forward scattering: identity on the Stokes state
    M0 = rayleigh_scatter_mueller(v(0, 0, 1), v(0, 0, 1))
    Sf = mu.mm_apply_stokes(M0, (v(1, 1, 1), v(0.3, 0.3, 0.3),
                                 v(0.2, 0.2, 0.2), v(0.1, 0.1, 0.1)))
    vals = [float(np.asarray(s.x)[0]) for s in Sf]
    assert np.allclose(vals, [1.0, 0.3, 0.2, 0.1], atol=1e-5), vals


def test_rayleigh_medium_polarizes_side_scatter():
    """Single-scatter glow of a Rayleigh medium lit from the side is
    strongly polarized; the same geometry with an HG medium (ideal
    depolarizer) is not."""
    import numpy as np
    from mitsuba3dopplertof_tpu.core import transform as tf
    mi.set_variant("tpu_rgb_polarized")
    try:
        def scene(phase):
            return mi.load_dict({
                "type": "scene",
                "integrator": {"type": "stokes",
                               "nested": {"type": "volpath",
                                          "max_depth": 3}},
                # camera looks along -z at the medium; light shines
                # along -x: 90-degree single scattering into the camera
                "sensor": {"type": "perspective", "fov": 40,
                           "to_world": tf.look_at([0, 0, -4], [0, 0, 0],
                                                  [0, 1, 0]),
                           "film": {"type": "hdrfilm", "width": 8,
                                    "height": 8, "rfilter": {"type": "box"}},
                           "sampler": {"type": "independent",
                                       "sample_count": 128}},
                "medium_box": {"type": "cube",
                               "to_world": tf.scale([1.0, 1.0, 1.0]),
                               "bsdf": {"type": "null"},
                               "interior": {"type": "homogeneous",
                                            "sigma_t": {"type": "rgb",
                                                        "value": 0.4},
                                            "albedo": {"type": "rgb",
                                                       "value": 0.9},
                                            "phase": {"type": phase}}},
                "light": {"type": "directional", "direction": [1, 0, 0],
                          "irradiance": {"type": "rgb", "value": 10.0}}})
        def dop(img):
            s0 = img[..., 3:6].sum(-1)
            s1 = img[..., 6:9].sum(-1)
            s2 = img[..., 9:12].sum(-1)
            m = s0 > 0.3 * s0.max()
            return (np.sqrt(s1 ** 2 + s2 ** 2)[m] / s0[m]).mean()
        d_ray = dop(np.asarray(mi.render(scene("rayleigh"), spp=128,
                                         seed=0)))
        d_hg = dop(np.asarray(mi.render(scene("isotropic"), spp=128,
                                        seed=0)))
        assert d_ray > 0.5, d_ray                # ~90-deg: near-full DOP
        assert d_hg < 0.05, d_hg                 # depolarizer
    finally:
        mi.set_variant("tpu_rgb")


def test_spectral_polarized_variant():
    """tpu_spectral_polarized: Mueller transport with hero-wavelength
    samples and tabulated conductor eta(lambda)/k(lambda). S0 converges
    to the rgb_polarized render up to metamerism; the polarization signal
    survives the spectral path."""
    import numpy as np
    from mitsuba3dopplertof_tpu.core import transform as tf

    def scene():
        return mi.load_dict({
            "type": "scene",
            "integrator": {"type": "stokes",
                           "nested": {"type": "path", "max_depth": 3}},
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": tf.look_at([0, 1.8, -3], [0, 0, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 8, "height": 8,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 96}},
            "floor": {"type": "rectangle",
                      "to_world": tf.rotate([1, 0, 0], -90)
                      @ tf.scale([3, 3, 1]),
                      "bsdf": {"type": "roughconductor", "alpha": 0.15,
                               "material": "Au"}},
            "light": {"type": "sphere", "radius": 0.4,
                      "to_world": tf.translate([2.5, 3, -1]),
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb",
                                               "value": 40.0}}}})
    try:
        mi.set_variant("tpu_rgb_polarized")
        a = np.asarray(mi.render(scene(), spp=96, seed=0))
        mi.set_variant("tpu_spectral_polarized")
        b = np.asarray(mi.render(scene(), spp=96, seed=0))
        assert np.isfinite(b).all()
        # S0 parity up to metamerism + the gold spectral eta/k shift
        r = b[..., 3:6].sum() / a[..., 3:6].sum()
        assert abs(r - 1.0) < 0.25, r
        # linear polarization present in both
        lp_b = np.abs(b[..., 6:12]).sum()
        assert lp_b > 1e-3, lp_b
    finally:
        mi.set_variant("tpu_rgb")
