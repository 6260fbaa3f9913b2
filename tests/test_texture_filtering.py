"""Bitmap texture filtering + wrapping vs a numpy oracle (reference
src/textures/bitmap.cpp:145-163 filter_type / wrap_mode semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3dopplertof_tpu as mi
from mitsuba3dopplertof_tpu.core import transform as tf
from mitsuba3dopplertof_tpu.textures import eval_texture


IMG = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3) / 100.0


def _sa(tmp_path, **tex_props):
    import mitsuba3dopplertof_tpu.io.bitmap as bm
    path = str(tmp_path / "t.exr")
    bm.write_bitmap(path, IMG)
    d = {"type": "scene",
         "sensor": {"type": "perspective", "fov": 45,
                    "film": {"type": "hdrfilm", "width": 4, "height": 4}},
         "wall": {"type": "rectangle",
                  "bsdf": {"type": "diffuse",
                           "reflectance": dict(type="bitmap", filename=path,
                                               **tex_props)}}}
    return mi.load_dict(d).compile()


def _eval(sa, us, vs):
    n = len(us)
    r = eval_texture(sa, jnp.zeros(n, jnp.int32),
                     jnp.asarray(us, jnp.float32),
                     jnp.asarray(vs, jnp.float32))
    return np.stack([np.asarray(r.x), np.asarray(r.y), np.asarray(r.z)], -1)


def _wrap_idx(i, n, mode):
    if mode == "repeat":
        return i % n
    if mode == "mirror":
        t = i % (2 * n)
        return np.where(t >= n, 2 * n - 1 - t, t)
    return np.clip(i, 0, n - 1)


def _oracle(us, vs, mode="repeat", filt="bilinear"):
    h, w, _ = IMG.shape
    us = np.asarray(us, np.float64)
    vs = np.asarray(vs, np.float64)
    if filt == "nearest":
        xi = _wrap_idx(np.floor(us * w).astype(int), w, mode)
        yi = _wrap_idx(np.floor(vs * h).astype(int), h, mode)
        return IMG[yi, xi]
    xf = us * w - 0.5
    yf = vs * h - 0.5
    x0 = np.floor(xf).astype(int)
    y0 = np.floor(yf).astype(int)
    fx = (xf - x0)[:, None]
    fy = (yf - y0)[:, None]

    def tap(xi, yi):
        return IMG[_wrap_idx(yi, h, mode), _wrap_idx(xi, w, mode)]
    return (tap(x0, y0) * (1 - fx) * (1 - fy)
            + tap(x0 + 1, y0) * fx * (1 - fy)
            + tap(x0, y0 + 1) * (1 - fx) * fy
            + tap(x0 + 1, y0 + 1) * fx * fy)


RNG = np.random.RandomState(3)
US = RNG.uniform(-1.5, 2.5, 64)
VS = RNG.uniform(-1.5, 2.5, 64)


@pytest.mark.parametrize("mode", ["repeat", "mirror", "clamp"])
def test_bilinear_wrap_modes(tmp_path, mode):
    sa = _sa(tmp_path, wrap_mode=mode)          # filter defaults bilinear
    got = _eval(sa, US, VS)
    want = _oracle(US, VS, mode=mode, filt="bilinear")
    assert np.allclose(got, want, atol=2e-3), np.abs(got - want).max()


@pytest.mark.parametrize("mode", ["repeat", "mirror", "clamp"])
def test_nearest_wrap_modes(tmp_path, mode):
    sa = _sa(tmp_path, filter_type="nearest", wrap_mode=mode)
    # keep off texel boundaries where float rounding flips the texel
    us = US + 1e-3
    vs = VS + 1e-3
    got = _eval(sa, us, vs)
    want = _oracle(us, vs, mode=mode, filt="nearest")
    assert np.allclose(got, want, atol=2e-3), np.abs(got - want).max()


def test_bilinear_is_interpolating(tmp_path):
    """At texel centers bilinear returns the texel exactly; midway it
    averages the neighbors."""
    sa = _sa(tmp_path)
    h, w, _ = IMG.shape
    u_c = (np.arange(w) + 0.5) / w
    # texel centers of row 0
    got0 = _eval(sa, u_c, np.full(w, 0.5 / h))
    assert np.allclose(got0, IMG[0, :, :], atol=2e-3)
    mid = _eval(sa, (u_c[:-1] + u_c[1:]) / 2.0, np.full(w - 1, 0.5 / h))
    assert np.allclose(mid, 0.5 * (IMG[0, :-1] + IMG[0, 1:]), atol=2e-3)


def test_invalid_modes_raise(tmp_path):
    with pytest.raises(RuntimeError):
        _sa(tmp_path, wrap_mode="bogus")
    with pytest.raises(RuntimeError):
        _sa(tmp_path, filter_type="trilinear")
