"""Per-texel spectral upsampling of bitmap reflectance (VERDICT round-2
item 4; reference ext/rgb2spec tables + src/core/srgb.cpp): the
coefficient lattice must round-trip RGB, the texture eval must return a
real spectrum under tpu_spectral, a saturated texel must show the correct
spectral shape, and the spectral render of a textured scene must agree
with tpu_rgb in the mean."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import cie
from mitsuba3dopplertof_tpu.core import transform as tf


@pytest.fixture(autouse=True)
def _restore_variant():
    yield
    mi.set_variant("tpu_rgb")


def test_lattice_roundtrip():
    rng = np.random.default_rng(3)
    rgbs = rng.uniform(0.05, 0.9, (32, 3)).astype(np.float32)
    coeffs = cie.upsample_rgb_array(rgbs)
    for c, rgb in zip(coeffs, rgbs):
        back = cie.rgb_of_coeffs(c.astype(np.float64))
        # trilinear lattice interpolation: a few % in the worst corner
        np.testing.assert_allclose(back, rgb, atol=0.03)


def _textured_scene(img):
    import tempfile
    from mitsuba3dopplertof_tpu.io.bitmap import write_bitmap
    path = os.path.join(tempfile.mkdtemp(), "tex.exr")
    write_bitmap(path, img.astype(np.float32))
    return mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 32, "height": 32,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 16}},
        "light": {"type": "point", "position": [0, 0, 4],
                  "intensity": {"type": "rgb", "value": 20.0}},
        "plane": {"type": "rectangle",
                  "to_world": tf.scale([2.5, 2.5, 1]),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "bitmap",
                                           "filename": path}}},
    })


def test_bitmap_spectral_eval_matches_coeffs():
    """eval_texture with wavelengths returns the sigmoid-polynomial
    spectrum of the texel's upsampled coefficients."""
    from mitsuba3dopplertof_tpu.core.vec import Vec3
    from mitsuba3dopplertof_tpu.textures import eval_texture
    img = np.full((4, 4, 3), [0.7, 0.2, 0.1], np.float32)
    mi.set_variant("tpu_spectral")
    sa = _textured_scene(img).compile()
    assert sa.tex_atlas_c0.shape[0] > 1
    n = 8
    lam = np.linspace(420.0, 680.0, n).astype(np.float32)
    wl = Vec3(jnp.asarray(lam), jnp.asarray(lam), jnp.asarray(lam))
    uv = jnp.full((n,), 0.4, jnp.float32)
    tid = jnp.zeros((n,), jnp.int32)
    val = eval_texture(sa, tid, uv, uv, wavelengths=wl)
    expect_c = cie.upsample_rgb_array(np.array([[0.7, 0.2, 0.1]]))[0]
    expect = np.asarray(cie.eval_reflectance_spectrum(
        *[jnp.float32(c) for c in expect_c], jnp.asarray(lam)))
    # EXR half-float texel quantization moves coefficients slightly
    np.testing.assert_allclose(np.asarray(val.x), expect, rtol=1e-2,
                               atol=1e-3)
    # saturated red: short wavelengths must reflect far less than long
    s450 = float(np.asarray(val.x)[0])
    s650 = float(np.asarray(val.x)[-1])
    assert s650 > 3 * s450


def test_textured_render_spectral_matches_rgb():
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4] = [0.6, 0.3, 0.2]
    img[:, 4:] = [0.2, 0.5, 0.6]
    mi.set_variant("tpu_rgb")
    ref = np.asarray(mi.render(_textured_scene(img), spp=64, seed=0))
    mi.set_variant("tpu_spectral")
    spec = np.asarray(mi.render(_textured_scene(img), spp=256, seed=1))
    lit = ref.max(-1) > 1e-3
    # mean agreement per channel over lit pixels (hero-wavelength MC noise
    # + metamer mismatch stay within a few percent)
    for c in range(3):
        a = ref[..., c][lit].mean()
        b = spec[..., c][lit].mean()
        assert abs(a - b) / max(a, 1e-6) < 0.05, (c, a, b)
