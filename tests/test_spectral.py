"""tpu_spectral variant: hero-wavelength rendering with sigmoid spectral
upsampling (reference's spectral variants: src/core/spectrum.cpp CIE
machinery + ext/rgb2spec upsampling; here re-derived analytically in
core/cie.py)."""

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import cie


@pytest.fixture(autouse=True)
def _restore_variant():
    yield
    mi.set_variant("tpu_rgb")


def test_fit_roundtrip():
    """rgb -> sigmoid coefficients -> rgb under D65 must round-trip."""
    for rgb in ([0.725, 0.71, 0.68], [0.63, 0.065, 0.05],
                [0.14, 0.45, 0.091], [0.1, 0.2, 0.8], [0.5, 0.5, 0.5]):
        c = cie.fit_reflectance_coeffs(rgb)
        back = cie.rgb_of_coeffs(np.asarray(c, np.float64))
        assert np.abs(back - np.asarray(rgb)).max() < 2e-3, (rgb, back)


def test_cmf_peaks():
    """Analytic CMFs peak near the canonical wavelengths."""
    lam = np.linspace(380.0, 780.0, 2001)
    import jax.numpy as jnp
    x = np.asarray(cie.cie_xbar(jnp.asarray(lam)))
    y = np.asarray(cie.cie_ybar(jnp.asarray(lam)))
    z = np.asarray(cie.cie_zbar(jnp.asarray(lam)))
    assert abs(lam[x.argmax()] - 599.8) < 5
    assert abs(lam[y.argmax()] - 555.0) < 10
    assert abs(lam[z.argmax()] - 445.0) < 10


@pytest.fixture(scope="module")
def scenes():
    mi.set_variant("tpu_rgb")
    s_rgb = mi.load_file("/root/reference/configs_example/scene.xml",
                         resx=8, resy=8)
    mi.set_variant("tpu_spectral")
    s_sp = mi.load_file("/root/reference/configs_example/scene.xml",
                        resx=8, resy=8)
    mi.set_variant("tpu_rgb")
    return s_rgb, s_sp


def test_spectral_matches_rgb_render(scenes):
    """A spectral render of an rgb-textured scene converges to the rgb
    render (up to metamerism, a few percent on saturated albedos)."""
    s_rgb, s_sp = scenes
    integ = {"type": "path", "max_depth": 4}
    mi.set_variant("tpu_rgb")
    a = np.asarray(mi.load_dict(integ).render(s_rgb, seed=0, spp=128))
    mi.set_variant("tpu_spectral")
    b = np.asarray(mi.load_dict(integ).render(s_sp, seed=0, spp=128))
    ratio = b[..., :3].mean() / a[..., :3].mean()
    assert abs(ratio - 1.0) < 0.08, ratio


def test_spectral_homodyne_limit(scenes):
    """dopplertofpath under tpu_spectral keeps the homodyne identity
    (w_g -> 0, hetero 0): image == 0.25 x path image."""
    _, s_sp = scenes
    mi.set_variant("tpu_spectral")
    homo = mi.load_dict({
        "type": "dopplertofpath", "max_depth": 4, "w_g": 1e-4,
        "hetero_frequency": 0.0, "hetero_offset": 0.0,
        "time_sampling_method": "uniform", "path_correlation_depth": 0})
    path = mi.load_dict({"type": "path", "max_depth": 4})
    a = np.asarray(homo.render(s_sp, seed=0, spp=64))
    b = np.asarray(path.render(s_sp, seed=0, spp=64))
    ratio = a[..., :3].mean() / (0.25 * b[..., :3].mean())
    assert abs(ratio - 1.0) < 0.02, ratio


def test_mono_variant(scenes):
    """tpu_mono collapses all color inputs to BT.709 luminance: the three
    output channels are identical and equal the rgb render's luminance."""
    s_rgb, _ = scenes
    mi.set_variant("tpu_mono")
    s_mono = mi.load_file("/root/reference/configs_example/scene.xml",
                          resx=8, resy=8)
    integ = {"type": "path", "max_depth": 4}
    m = np.asarray(mi.load_dict(integ).render(s_mono, seed=0, spp=64))
    assert np.allclose(m[..., 0], m[..., 1])
    assert np.allclose(m[..., 1], m[..., 2])
    mi.set_variant("tpu_rgb")
    r = np.asarray(mi.load_dict(integ).render(s_rgb, seed=0, spp=64))
    lum = 0.2126 * r[..., 0] + 0.7152 * r[..., 1] + 0.0722 * r[..., 2]
    assert abs(m[..., 0].mean() / lum.mean() - 1.0) < 0.02


def test_neutral_and_unsupported(scenes):
    _, s_sp = scenes
    mi.set_variant("tpu_spectral")
    v = np.asarray(mi.load_dict({"type": "velocity", "time": 0.0015})
                   .render(s_sp, seed=0, spp=4))
    assert np.isfinite(v).all()


def test_spectral_ptracer_matches_rgb(scenes):
    """Light tracing under tpu_spectral (hero wavelengths sampled per
    light path, emission SPDs, spectral->sRGB at the splat) converges to
    the rgb ptracer render up to metamerism."""
    s_rgb, s_sp = scenes
    integ = {"type": "ptracer", "max_depth": 4}
    mi.set_variant("tpu_rgb")
    a = np.asarray(mi.load_dict(integ).render(s_rgb, seed=0, spp=256))
    mi.set_variant("tpu_spectral")
    b = np.asarray(mi.load_dict(integ).render(s_sp, seed=0, spp=256))
    assert np.isfinite(b).all()
    ratio = b[..., :3].mean() / a[..., :3].mean()
    assert abs(ratio - 1.0) < 0.08, ratio


def test_spectral_volpath_beer_lambert():
    """Gray homogeneous medium under tpu_spectral: Beer-Lambert holds
    (sigma_t upsampled to a flat spectrum)."""
    from mitsuba3dopplertof_tpu.core import transform as tf
    mi.set_variant("tpu_spectral")
    sc = mi.load_dict({
        "type": "scene",
        "box": {"type": "cube", "bsdf": {"type": "null"},
                "interior": {"type": "homogeneous", "sigma_t": 0.5,
                             "albedo": 0.0}},
        "light": {"type": "rectangle",
                  "to_world": (tf.translate([0, 0, 4.0])
                               @ tf.rotate([1, 0, 0], 180)),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 1.0}}},
        "sensor": {"type": "radiancemeter",
                   "to_world": tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 1, "height": 1},
                   "sampler": {"type": "independent",
                               "sample_count": 2048}},
        "integrator": {"type": "volpath", "max_depth": 8},
    })
    tr = np.asarray(sc.integrator.render(sc, seed=0, spp=2048)).ravel()[:3]
    assert abs(tr.mean() / np.exp(-1.0) - 1.0) < 0.05, tr


def test_specfilm_srf_binning():
    """specfilm (reference src/films/specfilm.cpp): one channel per sensor
    response function; disjoint bands partition the full-range integral."""
    from mitsuba3dopplertof_tpu.core.transform import look_at
    mi.set_variant("tpu_spectral")

    def sc(srfs):
        return mi.load_dict({
            "type": "scene",
            "light": {"type": "rectangle",
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb", "value": 1.0}}},
            "sensor": {"type": "radiancemeter",
                       "to_world": look_at([0, 0, 2], [0, 0, 0], [0, 1, 0]),
                       "film": dict({"type": "specfilm", "width": 1,
                                     "height": 1}, **srfs),
                       "sampler": {"type": "independent",
                                   "sample_count": 512}},
            "integrator": {"type": "path", "max_depth": 2},
        })

    bands = {
        "band1": {"type": "regular", "lambda_min": 360.0,
                  "lambda_max": 517.0, "values": "1, 1"},
        "band2": {"type": "regular", "lambda_min": 517.0,
                  "lambda_max": 673.0, "values": "1, 1"},
        "band3": {"type": "regular", "lambda_min": 673.0,
                  "lambda_max": 830.0, "values": "1, 1"},
    }
    s1 = sc(bands)
    img = np.asarray(s1.integrator.render(s1, seed=0, spp=512)).ravel()
    assert img.shape == (3,)
    full = sc({"all": {"type": "regular", "lambda_min": 360.0,
                       "lambda_max": 830.0, "values": "1, 1"}})
    tot = np.asarray(full.integrator.render(full, seed=0, spp=512)).ravel()
    assert abs(img.sum() / tot[0] - 1.0) < 1e-3
    assert (img > 0.1).all()       # every band sees the D65-shaped emission


def test_spectral_gold_conductor():
    """Named conductors interpolate real eta/k spectra under tpu_spectral
    (VERDICT round-1 item 7; reference ior.h complex_ior_from_file).
    Gold's Fresnel reflectance rises steeply from blue to red, so a
    white-lit gold sphere must render with R > G > B — and the spectral
    render must stay in the same hue family as the rgb-tint variant."""
    import numpy as np
    from mitsuba3dopplertof_tpu.core import transform as tf

    def scene():
        return mi.load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": tf.look_at([0, 0, -4], [0, 0, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 16,
                                "height": 16},
                       "sampler": {"type": "independent",
                                   "sample_count": 128}},
            "ball": {"type": "sphere",
                     "bsdf": {"type": "roughconductor", "material": "Au",
                              "alpha": 0.3}},
            "light": {"type": "point", "position": [1, 2, -4],
                      "intensity": {"type": "rgb", "value": 50.0}},
        })

    mi.set_variant("tpu_spectral")
    try:
        img_s = np.asarray(mi.render(scene(), seed=0))[..., :3]
    finally:
        mi.set_variant("tpu_rgb")
    img_r = np.asarray(mi.render(scene(), seed=0))[..., :3]

    assert np.isfinite(img_s).all()
    cs = img_s.reshape(-1, 3).sum(axis=0)
    cr = img_r.reshape(-1, 3).sum(axis=0)
    assert cs[0] > cs[1] > cs[2], cs         # gold hue, spectral
    assert cr[0] > cr[1] > cr[2], cr         # gold hue, rgb
    # same hue family: R/B ratios within 2x of each other
    rat_s = cs[0] / max(cs[2], 1e-9)
    rat_r = cr[0] / max(cr[2], 1e-9)
    assert 0.5 < rat_s / rat_r < 2.0, (rat_s, rat_r)


def test_spectral_plastic_upsampled():
    """Plastic/roughplastic/principled constant colors are spectrally
    upsampled (not rgb-tinted) under tpu_spectral: a saturated red
    roughplastic render stays in the rgb render's hue family and total
    energy (metamerism-level deviation only)."""
    import numpy as np
    from mitsuba3dopplertof_tpu.core import transform as tf

    def scene(bsdf):
        return mi.load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sensor": {"type": "perspective", "fov": 45,
                       "to_world": tf.look_at([0, 0, 4], [0, 0, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 12,
                                "height": 12},
                       "sampler": {"type": "independent",
                                   "sample_count": 128}},
            "floor": {"type": "rectangle",
                      "to_world": tf.scale([3, 3, 1]), "bsdf": bsdf},
            "light": {"type": "point", "position": [1, 2, 4],
                      "intensity": {"type": "rgb", "value": 50.0}},
        })

    for bsdf in (
        {"type": "roughplastic", "alpha": 0.3,
         "diffuse_reflectance": {"type": "rgb", "value": [0.7, 0.15, 0.1]}},
        {"type": "plastic",
         "diffuse_reflectance": {"type": "rgb", "value": [0.7, 0.15, 0.1]}},
        {"type": "principled",
         "base_color": {"type": "rgb", "value": [0.7, 0.15, 0.1]},
         "roughness": 0.4},
    ):
        mi.set_variant("tpu_spectral")
        try:
            img_s = np.asarray(mi.render(scene(bsdf), seed=0))[..., :3]
        finally:
            mi.set_variant("tpu_rgb")
        img_r = np.asarray(mi.render(scene(bsdf), seed=0))[..., :3]
        assert np.isfinite(img_s).all()
        cs = img_s.reshape(-1, 3).mean(axis=0)
        cr = img_r.reshape(-1, 3).mean(axis=0)
        name = bsdf["type"]
        assert cs[0] > 2.5 * cs[1] and cs[0] > 2.5 * cs[2], (name, cs)
        ratio = cs.sum() / cr.sum()
        assert abs(ratio - 1.0) < 0.12, (name, ratio, cs, cr)


def test_spectral_envmap_matches_rgb():
    """Envmap radiance under tpu_spectral uses per-texel emission spectra
    (the env analog of the rgb2spec texture atlases): a colored envmap
    render converges to the rgb render up to metamerism, and a white
    envmap is near-exact."""
    from mitsuba3dopplertof_tpu.core import transform as tf

    def scene_dict(color):
        return {
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sensor": {"type": "perspective", "fov": 60,
                       "to_world": tf.look_at([0, 1, -3], [0, 0, 0],
                                              [0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 8, "height": 8,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 64}},
            "floor": {"type": "rectangle",
                      "to_world": tf.rotate([1, 0, 0], -90)
                      @ tf.scale([2, 2, 1]),
                      "bsdf": {"type": "diffuse"}},
            "env": {"type": "envmap",
                    "radiance": {"type": "rgb", "value": color}}}

    for color, tol in (([1.0, 1.0, 1.0], 0.03), ([0.9, 0.4, 0.15], 0.08)):
        mi.set_variant("tpu_rgb")
        a = np.asarray(mi.render(mi.load_dict(scene_dict(color)), spp=64,
                                 seed=0))
        mi.set_variant("tpu_spectral")
        b = np.asarray(mi.render(mi.load_dict(scene_dict(color)), spp=64,
                                 seed=0))
        mi.set_variant("tpu_rgb")
        ratio = b[..., :3].mean() / a[..., :3].mean()
        assert abs(ratio - 1.0) < tol, (color, ratio)
