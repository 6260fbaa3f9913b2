"""Convenience helpers mirroring the reference's ``mitsuba.util`` module
(reference src/python/python/util.py:523-560 ``convert_to_bitmap`` /
``write_bitmap``, :560-688 ``cornell_box``) so driver scripts port with an
import swap. Images here are plain numpy/jax arrays rather than Bitmap
objects — ``convert_to_bitmap`` therefore returns an ndarray (uint8 sRGB
or float32) and ``write_bitmap`` dispatches on the file extension through
io.bitmap's codec set.
"""

from __future__ import annotations

import numpy as np


def convert_to_bitmap(data, uint8_srgb: bool = True) -> np.ndarray:
    """Return ``data`` as an (H, W, C) ndarray; with ``uint8_srgb`` the
    linear values are gamma-encoded (IEC 61966-2-1) and quantized."""
    img = np.asarray(data, np.float32)
    if not uint8_srgb:
        return img
    a = np.clip(img, 0.0, 1.0)
    srgb = np.where(a <= 0.0031308, a * 12.92,
                    1.055 * np.power(np.maximum(a, 1e-12), 1 / 2.4) - 0.055)
    return (srgb * 255.0 + 0.5).astype(np.uint8)


def write_bitmap(filename: str, data, write_async: bool = True,
                 quality: int = -1) -> None:
    """Write ``data`` to PNG/JPEG/EXR/... by extension. LDR formats are
    gamma-encoded first (matching the reference's uint8-sRGB conversion);
    HDR formats store linear float. ``write_async``/``quality`` are
    accepted for signature compatibility (writes here are synchronous;
    JPEG quality is fixed by the codec)."""
    from .io.bitmap import write_bitmap as _write
    low = filename.lower()
    ldr = low.endswith((".png", ".jpg", ".jpeg", ".ppm"))
    img = convert_to_bitmap(data, uint8_srgb=ldr)
    if ldr:
        img = img.astype(np.float32) / 255.0   # codec re-quantizes
    _write(filename, img)


def cornell_box() -> dict:
    """Scene dict for the classic Cornell box (same ids, layout, and
    radiometry as the reference helper so tutorial code runs unchanged)."""
    from .core.transform import look_at, translate, rotate, scale

    def T(*ms):
        out = np.eye(4, dtype=np.float64)
        for m in ms:
            out = out @ m
        return out

    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 8},
        "sensor": {
            "type": "perspective",
            "fov_axis": "smaller",
            "near_clip": 0.001,
            "far_clip": 100.0,
            "focus_distance": 1000,
            "fov": 39.3077,
            "to_world": look_at([0, 0, 3.90], [0, 0, 0], [0, 1, 0]),
            "sampler": {"type": "independent", "sample_count": 64},
            "film": {
                "type": "hdrfilm", "width": 256, "height": 256,
                "rfilter": {"type": "gaussian"},
                "pixel_format": "rgb", "component_format": "float32",
            },
        },
        "white": {"type": "diffuse",
                  "reflectance": {"type": "rgb",
                                  "value": [0.885809, 0.698859, 0.666422]}},
        "green": {"type": "diffuse",
                  "reflectance": {"type": "rgb",
                                  "value": [0.105421, 0.37798, 0.076425]}},
        "red": {"type": "diffuse",
                "reflectance": {"type": "rgb",
                                "value": [0.570068, 0.0430135, 0.0443706]}},
        "light": {
            "type": "rectangle",
            "to_world": T(translate([0.0, 0.99, 0.01]),
                          rotate([1, 0, 0], 90),
                          scale([0.23, 0.19, 0.19])),
            "bsdf": {"type": "ref", "id": "white"},
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb",
                                     "value": [18.387, 13.9873, 6.75357]}},
        },
        "floor": {"type": "rectangle",
                  "to_world": T(translate([0.0, -1.0, 0.0]),
                                rotate([1, 0, 0], -90)),
                  "bsdf": {"type": "ref", "id": "white"}},
        "ceiling": {"type": "rectangle",
                    "to_world": T(translate([0.0, 1.0, 0.0]),
                                  rotate([1, 0, 0], 90)),
                    "bsdf": {"type": "ref", "id": "white"}},
        "back": {"type": "rectangle",
                 "to_world": translate([0.0, 0.0, -1.0]),
                 "bsdf": {"type": "ref", "id": "white"}},
        "green-wall": {"type": "rectangle",
                       "to_world": T(translate([1.0, 0.0, 0.0]),
                                     rotate([0, 1, 0], -90)),
                       "bsdf": {"type": "ref", "id": "green"}},
        "red-wall": {"type": "rectangle",
                     "to_world": T(translate([-1.0, 0.0, 0.0]),
                                   rotate([0, 1, 0], 90)),
                     "bsdf": {"type": "ref", "id": "red"}},
        "small-box": {
            "type": "cube",
            "to_world": T(translate([0.335, -0.7, 0.38]),
                          rotate([0, 1, 0], -17),
                          scale(0.3)),
            "bsdf": {"type": "ref", "id": "white"}},
        "large-box": {
            "type": "cube",
            "to_world": T(translate([-0.33, -0.4, -0.28]),
                          rotate([0, 1, 0], 18.25),
                          scale([0.3, 0.61, 0.3])),
            "bsdf": {"type": "ref", "id": "white"}},
    }


__all__ = ["convert_to_bitmap", "write_bitmap", "cornell_box"]


# ---------------------------------------------------------------------------
# Thin type/threading compat aliases (reference python bindings surface) so
# tutorial snippets port unchanged. Points/vectors/colors are numpy arrays;
# TensorXf is a jax array.
# ---------------------------------------------------------------------------

def _vecN(n):
    def make(*args):
        if len(args) == 1:
            a = np.asarray(args[0], np.float32)
            if a.ndim == 0:
                return np.full(n, float(a), np.float32)
            return a.reshape(-1)[:n].astype(np.float32)
        return np.asarray(args, np.float32)[:n]
    return make


ScalarPoint2f = Point2f = _vecN(2)
ScalarPoint3f = Point3f = _vecN(3)
ScalarVector3f = Vector3f = _vecN(3)
ScalarColor3f = Color3f = _vecN(3)


def TensorXf(data, shape=None):
    import jax.numpy as jnp
    a = jnp.asarray(data, jnp.float32)
    return a.reshape(shape) if shape is not None else a


class Thread:
    """reference Thread::thread() compat: exposes the file resolver the
    way tutorial code reaches it (mi.Thread.thread().file_resolver())."""

    _instance = None

    @classmethod
    def thread(cls):
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def file_resolver(self):
        from .core.fresolver import file_resolver
        return file_resolver()

    def set_file_resolver(self, fres):
        from .core import fresolver as _m
        _m._resolver = fres
